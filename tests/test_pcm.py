"""IPCM encode path: PCM mode search (TEncSearch::IPCMSearch /
TEncCu::xCheckIntraPCM), pcm_flag + pcm_sample emission with arithmetic
engine flush/restart (TEncSbac::codeIPCMInfo), and the loop-filter PCM
sample restoration on the encoder's reconstruction."""

import os
import subprocess

import numpy as np
import pytest

from hm16_2_tpu.decode.top import Decoder
from hm16_2_tpu.encode.top import Encoder, EncoderConfig

HM_DEC = "/tmp/hmref/bin/TAppDecoderStatic"
HM_ENC = "/tmp/hmref/bin/TAppEncoderStatic"
HM_CFG = "/tmp/hmref/cfg/encoder_intra_main.cfg"
DATA = "/tmp/hevc_data"


def _noise_frames(w, h, n, seed=23):
    rng = np.random.default_rng(seed)
    return [[rng.integers(0, 256, (h, w), np.int32),
             rng.integers(0, 256, (h // 2, w // 2), np.int32),
             rng.integers(0, 256, (h // 2, w // 2), np.int32)]
            for _ in range(n)]


def test_pcm_encode_triggers_and_verifies(tmp_path):
    """Pure noise at very low QP: PCM beats transform coding, the stream
    shrinks, and both decoders verify it."""
    frames = _noise_frames(128, 64, 2)

    def encode(pcm):
        enc = Encoder(EncoderConfig(128, 64, qp=4, intra_period=1, pcm=pcm))
        stream, recons = b"", []
        for i, f in enumerate(frames):
            stream += enc.encode_frame(f, poc=i)
            recons.append(enc.last_recon)
        return stream, recons

    stream, recons = encode(pcm=True)
    base, _ = encode(pcm=False)
    assert len(stream) < len(base)          # PCM actually engaged and won
    pics = Decoder().decode_stream(stream)
    assert len(pics) == 2
    for i, p in enumerate(pics):
        assert p.hash_ok is True
        for c in range(3):
            np.testing.assert_array_equal(p.planes[c], recons[i][c])
    if os.path.exists(HM_DEC):
        bs = tmp_path / "t.bin"
        bs.write_bytes(stream)
        out = subprocess.run([HM_DEC, "-b", str(bs), "-o", "/dev/null"],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == 2, out.stdout + out.stderr


def test_pcm_not_chosen_at_normal_qp():
    frames = _noise_frames(64, 64, 1, seed=29)
    enc = Encoder(EncoderConfig(64, 64, qp=32, intra_period=1, pcm=True))
    stream = enc.encode_frame(frames[0], poc=0)
    pics = Decoder().decode_stream(stream)
    assert pics[0].hash_ok is True


@pytest.mark.skipif(not os.path.exists(HM_ENC) or
                    not os.path.exists(os.path.join(DATA, "bq416.yuv")),
                    reason="reference encoder or fixture input absent")
def test_pcm_hm_stream(tmp_path):
    bs = tmp_path / "hm_pcm.bin"
    subprocess.run(
        [HM_ENC, "-c", HM_CFG, "-i", os.path.join(DATA, "bq416.yuv"),
         "-wdt", "416", "-hgt", "240", "-fr", "30", "-f", "2", "-q", "4",
         "--SEIDecodedPictureHash=1", "--PCMEnabledFlag=1",
         "--PCMLog2MinSize=3", "--PCMLog2MaxSize=5",
         "-b", str(bs), "-o", "/dev/null"], check=True, capture_output=True)
    pics = Decoder().decode_stream(bs.read_bytes())
    assert len(pics) == 2 and all(p.hash_ok for p in pics)
