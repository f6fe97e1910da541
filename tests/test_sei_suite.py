"""SEI message suite: write -> parse roundtrip + in-stream emission
(SEIwrite.cpp / SEIread.cpp duals, headers/sei.py)."""

import numpy as np
import pytest

from hm16_2_tpu.bitstream.bitio import split_annexb, strip_emulation_prevention
from hm16_2_tpu.decode.top import parse_sei_rbsp
from hm16_2_tpu.headers import sei as S


def _payloads(nal: bytes):
    return parse_sei_rbsp(strip_emulation_prevention(nal[2:]))


@pytest.mark.parametrize("nal,ptype,checks", [
    (S.write_user_data_unregistered(b"hm16_2_tpu"), 5,
     {"data": lambda v: v.startswith("hm16_2_tpu")}),
    (S.write_tone_mapping(model_id=1), 23,
     {"model_id": 1, "sigmoid_midpoint": 128}),
    (S.write_frame_packing(4), 45, {"type": 4}),
    (S.write_display_orientation(180, hor_flip=1), 47,
     {"rotation": 180, "hor_flip": 1}),
    (S.write_temporal_level0_index(7, 2), 131,
     {"temporal_sub_layer_zero_idx": 7, "irap_pic_id": 2}),
    (S.write_region_refresh(1), 134, {"refreshed_region_flag": 1}),
    (S.write_no_display(), 135, {}),
    (S.write_time_code(14, 59, 9, 1), 136,
     {"n_frames": 14, "time": "01:09:59"}),
    (S.write_mastering_display(), 137,
     {"max_luminance": 10000000, "min_luminance": 500}),
])
def test_sei_roundtrip(nal, ptype, checks):
    msgs = _payloads(nal)
    assert len(msgs) == 1 and msgs[0][0] == ptype
    parsed = S.parse_payload(*msgs[0])
    assert parsed.payload_type == ptype
    assert "truncated" not in parsed.fields
    for k, want in checks.items():
        got = parsed.fields[k]
        assert want(got) if callable(want) else got == want, (k, got)


def test_stream_emission_and_dump():
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    rng = np.random.default_rng(3)
    frames = [[rng.integers(0, 255, (64, 64)).astype(np.int32),
               np.full((32, 32), 128, np.int32),
               np.full((32, 32), 128, np.int32)] for _ in range(2)]
    enc = Encoder(EncoderConfig(
        64, 64, qp=37, intra_period=1, sei_frame_packing=3,
        sei_display_orientation=90, sei_temporal_level0=True,
        sei_region_refresh=True, sei_time_code=True,
        sei_mastering_display=True, sei_tone_mapping=True))
    bs = b"".join(enc.encode_frame([p.copy() for p in f], i)
                  for i, f in enumerate(frames))
    lines = S.dump_stream_sei(bs)
    names = " ".join(lines)
    for want in ("frame_packing_arrangement", "display_orientation",
                 "mastering_display_colour_volume", "tone_mapping_info",
                 "region_refresh_info", "temporal_sub_layer_zero_index",
                 "time_code", "decoded_picture_hash"):
        assert want in names, want
    # per-IRAP emission: both frames are IDR -> two of each
    assert names.count("display_orientation") == 2
    assert "truncated" not in names
    # the stream must still self-decode clean
    from hm16_2_tpu.decode.top import Decoder
    pics = Decoder().decode_stream(bs)
    assert len(pics) == 2 and all(p.hash_ok for p in pics)
