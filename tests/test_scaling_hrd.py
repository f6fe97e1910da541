"""Scaling lists (default + explicit file) and HRD/buffering-period/
recovery-point SEI: encode, self-decode bit-exact, verify with the
reference decoder when present (TComScalingList, TEncCavlc codeHrdParameters,
SEIwrite.cpp)."""

import os
import subprocess

import numpy as np
import pytest

from hm16_2_tpu.decode.top import Decoder, parse_sei_rbsp
from hm16_2_tpu.encode.top import Encoder, EncoderConfig

HM_DEC = "/tmp/hmref/bin/TAppDecoderStatic"

# a flat-start HM-format scaling list file with non-default 8x8+ entries
_RAMP8 = """
16 16 16 16 17 18 20 24
16 16 16 17 18 20 24 25
16 16 17 18 20 24 25 28
16 17 18 20 24 25 28 33
17 18 20 24 25 28 33 41
18 20 24 25 28 33 41 54
20 24 25 28 33 41 54 71
24 25 28 33 41 54 71 91
"""
_FLAT4 = "\n" + " ".join(["16"] * 16) + "\n"


def _write_sl_file(path):
    parts = []
    for n in ("INTRA4X4_LUMA", "INTRA4X4_CHROMAU", "INTRA4X4_CHROMAV",
              "INTER4X4_LUMA", "INTER4X4_CHROMAU", "INTER4X4_CHROMAV"):
        parts.append(f"{n} ={_FLAT4}")
    for n in ("INTRA8X8_LUMA", "INTRA8X8_CHROMAU", "INTRA8X8_CHROMAV",
              "INTER8X8_LUMA", "INTER8X8_CHROMAU", "INTER8X8_CHROMAV"):
        parts.append(f"{n} ={_RAMP8}")
    for n in ("INTRA16X16_LUMA", "INTRA16X16_CHROMAU", "INTRA16X16_CHROMAV",
              "INTER16X16_LUMA", "INTER16X16_CHROMAU", "INTER16X16_CHROMAV",
              "INTRA32X32_LUMA", "INTER32X32_LUMA"):
        parts.append(f"{n} ={_RAMP8}{n}_DC =\n  16\n")
    path.write_text("\n".join(parts))


def _frames(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 32), np.int32)
    out = []
    for i in range(n):
        y = base[i * 2:i * 2 + h, i * 3:i * 3 + w].copy()
        u = np.full((h // 2, w // 2), 100 + 5 * i, np.int32)
        v = np.full((h // 2, w // 2), 140 - 3 * i, np.int32)
        out.append([y, u, v])
    return out


def _roundtrip(cfg, frames):
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
    return stream


def _hm_verify(stream, tmp_path, n):
    if not os.path.exists(HM_DEC):
        return
    bs = tmp_path / "t.bin"
    bs.write_bytes(stream)
    out = subprocess.run([HM_DEC, "-b", str(bs), "-o", "/dev/null"],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == n, out.stdout + out.stderr


@pytest.mark.parametrize("gop_kw", [dict(intra_period=1),
                                    dict(intra_period=4, gop="ld")])
def test_scaling_list_default(gop_kw, tmp_path):
    frames = _frames(64, 64, 3)
    cfg = EncoderConfig(64, 64, qp=30, scaling_list=1, **gop_kw)
    stream = _roundtrip(cfg, frames)
    _hm_verify(stream, tmp_path, 3)


def test_scaling_list_explicit_file(tmp_path):
    slf = tmp_path / "sl.txt"
    _write_sl_file(slf)
    frames = _frames(64, 64, 4, seed=5)
    cfg = EncoderConfig(64, 64, qp=30, intra_period=4, gop="ld",
                        scaling_list=2, scaling_list_file=str(slf))
    stream = _roundtrip(cfg, frames)
    _hm_verify(stream, tmp_path, 4)
    # the SPS must actually carry explicit scaling list data: re-parse it
    # and compare a non-default 8x8 list against the file values
    from hm16_2_tpu.bitstream.bitio import (BitReader, split_annexb,
                                            strip_emulation_prevention)
    from hm16_2_tpu.headers.parse import parse_sps
    sps = None
    for nal in split_annexb(stream):
        if (nal[0] >> 1) & 0x3F == 33:
            sps = parse_sps(BitReader(strip_emulation_prevention(nal[2:])))
            break
    assert sps is not None and sps.scaling_list_present
    lst = sps.scaling_list.lists[(1, 0)]      # INTRA8X8_LUMA
    assert lst[-1] == 91 and lst[0] == 16


def test_hrd_buffering_period_recovery_point(tmp_path):
    frames = _frames(64, 64, 3, seed=9)
    cfg = EncoderConfig(64, 64, qp=30, intra_period=1, sei_timing=True,
                        sei_buffering_period=True, sei_recovery_point=True)
    stream = _roundtrip(cfg, frames)
    _hm_verify(stream, tmp_path, 3)
    # every IRAP carries buffering-period (0) + recovery-point (6) SEI,
    # every picture a pic-timing (1) SEI with HRD delays
    from hm16_2_tpu.bitstream.bitio import (split_annexb,
                                            strip_emulation_prevention)
    types = []
    for nal in split_annexb(stream):
        nal_type = (nal[0] >> 1) & 0x3F
        if nal_type == 39:        # prefix SEI
            types += [t for t, _ in parse_sei_rbsp(
                strip_emulation_prevention(nal[2:]))]
    assert types.count(0) == 3    # buffering period at each IRAP
    assert types.count(6) == 3    # recovery point at each IRAP
    assert types.count(1) == 3    # pic timing per picture
