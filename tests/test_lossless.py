"""Lossless coding path: forced cu_transquant_bypass on every CU
(TransquantBypassEnableFlag + CUTransquantBypassFlagForce; HM QpParam /
TComTrQuant transquant-bypass branches, TComLoopFilter lossless sample
restoration).  Reconstruction must equal the source exactly in the
encoder, our decoder, and the HM reference decoder."""

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


def _frames(w, h, n, seed=17):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 32), np.int32)
    out = []
    for i in range(n):
        y = base[i * 2:i * 2 + h, i * 3:i * 3 + w].copy()
        u = rng.integers(0, 256, (h // 2, w // 2), np.int32)
        v = rng.integers(0, 256, (h // 2, w // 2), np.int32)
        out.append([y, u, v])
    return out


@pytest.mark.parametrize("kw", [
    dict(intra_period=1),
    dict(intra_period=4, gop="ld"),
])
@pytest.mark.slow
def test_lossless_encode(kw, tmp_path):
    frames = _frames(128, 64, 3)
    enc = Encoder(EncoderConfig(128, 64, qp=32, transquant_bypass=True,
                                **kw))
    stream = b""
    for i, f in enumerate(frames):
        stream += enc.encode_frame(f, poc=i)
        for c in range(3):        # encoder recon is the source, exactly
            np.testing.assert_array_equal(enc.last_recon[c], f[c])
    pics = Decoder().decode_stream(stream)
    assert len(pics) == 3
    for i, p in enumerate(pics):
        assert p.hash_ok is True
        for c in range(3):
            np.testing.assert_array_equal(p.planes[c], frames[i][c])
    if os.path.exists(HM_DEC):
        bs = tmp_path / "t.bin"
        bs.write_bytes(stream)
        out = subprocess.run([HM_DEC, "-b", str(bs), "-o", "/dev/null"],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == 3, out.stdout + out.stderr


@pytest.mark.skipif(not os.path.exists(HM_ENC) or
                    not os.path.exists(os.path.join(DATA, "bq416.yuv")),
                    reason="reference encoder or fixture input absent")
def test_lossless_hm_stream(tmp_path):
    bs = tmp_path / "hm_tqb.bin"
    subprocess.run(
        [HM_ENC, "-c", HM_CFG, "-i", os.path.join(DATA, "bq416.yuv"),
         "-wdt", "416", "-hgt", "240", "-fr", "30", "-f", "2", "-q", "32",
         "--SEIDecodedPictureHash=1", "--TransquantBypassEnableFlag=1",
         "--CUTransquantBypassFlagForce=1", "-b", str(bs),
         "-o", "/dev/null"], check=True, capture_output=True)
    pics = Decoder().decode_stream(bs.read_bytes())
    assert len(pics) == 2 and all(p.hash_ok for p in pics)
