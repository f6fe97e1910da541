"""Field coding: each field coded as a half-height picture with
pic_struct in pic-timing SEI; weave restores the frames
(TEncGOP.cpp:2370 isField path; TVideoIOYuv field split/interleave)."""

import numpy as np
import pytest

from hm16_2_tpu.decode.top import Decoder
from hm16_2_tpu.encode.top import Encoder, EncoderConfig
from hm16_2_tpu.io.yuv import interleave_fields, split_fields

pytestmark = pytest.mark.slow


def test_field_coding_roundtrip():
    from hm16_2_tpu.tools.realclip import make_clip
    frames = make_clip(128, 128, 2)
    enc = Encoder(EncoderConfig(128, 128, qp=32, intra_period=-1,
                                gop="ldp", field_coding=True,
                                sei_timing=True))
    bs = b"".join(enc.encode_stream([[p.copy() for p in f]
                                     for f in frames]))
    pics = sorted(Decoder().decode_stream(bs), key=lambda p: p.poc)
    assert len(pics) == 4 and all(p.hash_ok is True for p in pics)
    assert pics[0].planes[0].shape == (64, 128)      # field pictures
    # lossless split/weave identity on the source
    t, b = split_fields(frames[0])
    assert all(np.array_equal(w, o) for w, o in
               zip(interleave_fields(t, b), frames[0]))
    # pic-timing SEI carries alternating top/bottom pic_struct
    from hm16_2_tpu.headers.sei import dump_stream_sei
    structs = [ln for ln in dump_stream_sei(bs) if "pic_timing" in ln]
    assert len(structs) == 4
    assert "pic_struct=1" in structs[0] and "pic_struct=2" in structs[1]
