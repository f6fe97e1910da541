"""Header parsing round-trip against a reference-encoder bitstream.

Uses the golden HM stream if present (generated per .claude/skills/verify);
otherwise a synthetic header written by our own writer (once it exists).
"""

import os

import pytest

from hm16_2_tpu.bitstream.bitio import (
    BitReader, split_annexb, strip_emulation_prevention)
from hm16_2_tpu.headers.parse import (
    parse_pps, parse_slice_header, parse_sps, parse_vps)

GOLDEN = "/tmp/hevc_data/tiny64_ai.bin"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden stream absent")
def test_parse_golden_headers():
    data = open(GOLDEN, "rb").read()
    sps_map, pps_map, slices = {}, {}, []
    for nal in split_annexb(data):
        t = (nal[0] >> 1) & 63
        tid = (nal[1] & 7) - 1
        br = BitReader(strip_emulation_prevention(nal[2:]))
        if t == 32:
            parse_vps(br)
            assert br.bits_left() < 8
        elif t == 33:
            s = parse_sps(br)
            sps_map[s.sps_id] = s
            assert br.bits_left() < 8
            assert (s.pic_width, s.pic_height) == (64, 64)
            assert s.chroma_format_idc == 1 and s.bit_depth_luma == 8
            assert s.ctb_size == 64 and s.log2_min_cb == 3
        elif t == 34:
            p = parse_pps(br)
            pps_map[p.pps_id] = p
            assert br.bits_left() < 8
            assert p.init_qp == 26 and p.sign_data_hiding == 1
        elif t in (0, 1, 19, 20, 21):
            sh = parse_slice_header(br, t, tid, sps_map, pps_map)
            slices.append(sh)
    assert len(slices) == 2
    assert [sh.poc for sh in slices] == [0, 1]
    assert all(sh.slice_type == 2 for sh in slices)
    assert all(sh.qp == 32 for sh in slices)
