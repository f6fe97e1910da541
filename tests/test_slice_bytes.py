"""SliceMode 2 (byte-limited slices): cuts honour the budget and the
stream stays self-consistent (TEncSlice.cpp:526 fixed-bytes slices)."""

import numpy as np
import pytest

from hm16_2_tpu.bitstream.bitio import split_annexb
from hm16_2_tpu.decode.top import Decoder
from hm16_2_tpu.encode.top import Encoder, EncoderConfig

pytestmark = pytest.mark.slow


def _frames(n):
    from hm16_2_tpu.tools.bdrate import read_yuv_frames
    return read_yuv_frames("/tmp/hevc_data/bq416.yuv", 416, 240, n)


def test_byte_limited_slices_ai():
    frames = _frames(1)
    cfg = EncoderConfig(416, 240, qp=32, intra_period=1)
    cfg.slice_bytes = 1500
    enc = Encoder(cfg)
    bs = enc.encode_frame([p.copy() for p in frames[0]], 0)
    vcl = [len(n) for n in split_annexb(bs) if ((n[0] >> 1) & 0x3F) < 32]
    assert len(vcl) >= 2, vcl                 # the budget forces cuts
    # each slice respects the budget (+NAL/header margin; a single CTU
    # bigger than the budget may legitimately overflow)
    assert all(v <= 1500 + 128 for v in vcl), vcl
    pics = Decoder().decode_stream(bs)
    assert len(pics) == 1 and pics[0].hash_ok is True


def test_byte_limited_slices_inter():
    frames = _frames(3)
    cfg = EncoderConfig(416, 240, qp=27, intra_period=-1, gop="ldp")
    cfg.slice_bytes = 2000
    enc = Encoder(cfg)
    bs = b"".join(enc.encode_stream(frames))
    vcl = [len(n) for n in split_annexb(bs) if ((n[0] >> 1) & 0x3F) < 32]
    assert len(vcl) > 3, vcl                  # at least the I frame cut
    pics = Decoder().decode_stream(bs)
    assert len(pics) == 3 and all(p.hash_ok is True for p in pics)
