"""Golden-stream decode tests: bit-exact reconstruction of reference-encoder
bitstreams, verified via decoded-picture-hash SEI (the reference test
strategy, SURVEY.md section 4)."""

import os

import numpy as np
import pytest

from hm16_2_tpu.decode.top import Decoder

STREAMS = [
    ("/tmp/hevc_data/tiny64_ai_nolf.bin", "/tmp/hevc_data/tiny64_ai_nolf_rec.yuv", 64, 64),
    ("/tmp/hevc_data/bq_ai_nolf.bin", "/tmp/hevc_data/bq_ai_nolf_rec.yuv", 416, 240),
    ("/tmp/hevc_data/tiny64_ai.bin", "/tmp/hevc_data/tiny64_ai_rec.yuv", 64, 64),
    ("/tmp/hevc_data/bq_ai_q22.bin", "/tmp/hevc_data/bq_ai_q22_rec.yuv", 416, 240),
    ("/tmp/hevc_data/bq_ai_q37.bin", "/tmp/hevc_data/bq_ai_q37_rec.yuv", 416, 240),
    ("/tmp/hevc_data/tiny64_ldp.bin", "/tmp/hevc_data/tiny64_ldp_rec.yuv", 64, 64),
    ("/tmp/hevc_data/tiny64_ra.bin", "/tmp/hevc_data/tiny64_ra_rec.yuv", 64, 64),
    ("/tmp/hevc_data/bq_ldp.bin", "/tmp/hevc_data/bq_ldp_rec.yuv", 416, 240),
    ("/tmp/hevc_data/bq_ra.bin", "/tmp/hevc_data/bq_ra_rec.yuv", 416, 240),
]


def test_main10_decode():
    bs = "/tmp/hevc_data/tiny64_ra10.bin"
    if not os.path.exists(bs):
        pytest.skip("golden stream absent")
    dec = Decoder()
    pics = dec.decode_stream(open(bs, "rb").read())
    assert len(pics) == 8
    assert all(p.hash_ok is True for p in pics)


@pytest.mark.parametrize("bs,rec,w,h", STREAMS)
def test_bitexact_decode(bs, rec, w, h):
    if not os.path.exists(bs):
        pytest.skip("golden stream absent (see .claude/skills/verify)")
    dec = Decoder()
    pics = dec.decode_stream(open(bs, "rb").read())
    assert pics, "no pictures decoded"
    for p in pics:
        assert p.hash_ok is True, f"hash mismatch at POC {p.poc}"
    # byte-exact vs reference recon file
    raw = np.fromfile(rec, dtype=np.uint8)
    frame = w * h * 3 // 2
    for i, p in enumerate(sorted(pics, key=lambda x: x.poc)):
        ours = np.concatenate([pl.astype(np.uint8).ravel() for pl in p.planes])
        np.testing.assert_array_equal(ours, raw[i * frame:(i + 1) * frame])


@pytest.mark.parametrize("bs", ["/tmp/hevc_data/w512_wpp.bin",
                                "/tmp/hevc_data/w512_tile.bin"])
def test_wpp_tile_golden_decode(bs):
    """HM-encoded WPP / tile streams: substream split via entry points,
    per-substream CABAC with WPP context sync / tile resets."""
    if not os.path.exists(bs):
        pytest.skip("golden stream absent (see .claude/skills/verify)")
    dec = Decoder()
    pics = dec.decode_stream(open(bs, "rb").read())
    assert len(pics) == 3
    assert all(p.hash_ok is True for p in pics)


@pytest.mark.parametrize("bs", ["/tmp/hevc_data/t_crc.bin",
                                "/tmp/hevc_data/t_cksum.bin"])
def test_crc_checksum_hash_verify(bs):
    """CRC / checksum decoded-picture-hash SEI (TComPicYuvMD5.cpp:149-183)."""
    if not os.path.exists(bs):
        pytest.skip("golden stream absent (see tests/make_fixtures.py)")
    pics = Decoder().decode_stream(open(bs, "rb").read())
    assert pics and all(p.hash_ok is True for p in pics)


def test_encoder_crc_checksum_self_decode():
    """Encoder emits CRC / checksum hash SEI that our decoder verifies."""
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    rng = np.random.default_rng(3)
    planes = [rng.integers(0, 256, (64, 64)).astype(np.int32),
              rng.integers(0, 256, (32, 32)).astype(np.int32),
              rng.integers(0, 256, (32, 32)).astype(np.int32)]
    for ht in (1, 2):
        enc = Encoder(EncoderConfig(64, 64, qp=32, hash_type=ht))
        au = enc.encode_frame([p.copy() for p in planes], 0)
        pics = Decoder().decode_stream(au)
        assert len(pics) == 1 and pics[0].hash_ok is True


@pytest.mark.parametrize("bs", ["/tmp/hevc_data/t_pcm.bin",
                                "/tmp/hevc_data/t_pcm2.bin",
                                "/tmp/hevc_data/t_pcm3.bin"])
def test_pcm_decode(bs):
    """PCM CUs: raw-sample parse + engine re-init (TDecSbac.cpp:366-405),
    recon passthrough, PCM loop-filter-disable restoration."""
    if not os.path.exists(bs):
        pytest.skip("golden stream absent (see tests/make_fixtures.py)")
    pics = Decoder().decode_stream(open(bs, "rb").read())
    assert pics and all(p.hash_ok is True for p in pics)


@pytest.mark.parametrize("bs", ["/tmp/hevc_data/t_422.bin",
                                "/tmp/hevc_data/t_444.bin",
                                "/tmp/hevc_data/t_422_ld.bin",
                                "/tmp/hevc_data/t_444_ld.bin"])
def test_rext_chroma_format_decode(bs):
    """4:2:2 / 4:4:4 RExt streams: double-high chroma TU walk with per-sub-TU
    cbf (TComTU.h:48-162, TDecSbac.cpp:993-1092), per-PU chroma modes in
    4:4:4 intra NxN, persistent Rice adaptation, intra-only residual
    rotation — intra and inter (lowdelay) coverage."""
    if not os.path.exists(bs):
        pytest.skip("golden stream absent (see tests/make_fixtures.py)")
    pics = Decoder().decode_stream(open(bs, "rb").read())
    assert pics and all(p.hash_ok is True for p in pics)


def test_decoder_robustness_and_bumping():
    """C.5.2 output bumping, mid-stream CRA tune-in with RASL skip
    (TDecTop.cpp:840), and lost-reference concealment (TDecTop.cpp:229)."""
    from hm16_2_tpu.bitstream.bitio import split_annexb
    bs = "/tmp/hevc_data/bq_ra.bin"
    if not os.path.exists(bs):
        pytest.skip("golden stream absent")
    data = open(bs, "rb").read()
    d = Decoder()
    d.decode_stream(data)
    assert [p.poc for p in d.display] == sorted(p.poc for p in d.outputs)
    # drop one reference VCL NAL: decode must conceal, not raise
    nals = split_annexb(data)
    vcl = [i for i, n in enumerate(nals) if (n[0] >> 1) & 63 <= 31]
    d2 = Decoder()
    for i, n in enumerate(nals):
        if i != vcl[2]:
            d2.decode_nal(n)
    d2.flush()
    assert len(d2.outputs) == len(vcl) - 1
