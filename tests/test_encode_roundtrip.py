"""Encoder end-to-end: encode synthetic frames, decode with our own
bit-exact decoder, verify hash SEI and recon identity; if the reference
decoder binary is present, verify against it too."""

import os
import subprocess

import numpy as np
import pytest

from hm16_2_tpu.decode.top import Decoder
from hm16_2_tpu.encode.top import Encoder, EncoderConfig

HM_DEC = "/tmp/hmref/bin/TAppDecoderStatic"


def _synthetic_planes(w, h, t, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = ((xx * 2 + yy + t * 7) % 256 * 0.6 +
         0.4 * rng.integers(0, 256, (h, w))).astype(np.int32)
    u = ((xx // 2 + t) % 256)[::2, ::2].astype(np.int32)
    v = ((yy // 2 + 2 * t) % 256)[::2, ::2].astype(np.int32)
    return [np.clip(y, 0, 255), u, v]


@pytest.mark.parametrize("size,qp", [((64, 64), 32), ((128, 80), 27)])
def test_encode_selfdecode(size, qp):
    w, h = size
    rng = np.random.default_rng(1)
    enc = Encoder(EncoderConfig(w, h, qp=qp))
    stream = b""
    recons = []
    for t in range(2):
        planes = _synthetic_planes(w, h, t, rng)
        stream += enc.encode_frame(planes, t)
        recons.append(enc.last_recon)

    dec = Decoder()
    pics = dec.decode_stream(stream)
    assert len(pics) == 2
    for i, p in enumerate(pics):
        assert p.hash_ok is True
        for c in range(3):
            np.testing.assert_array_equal(p.planes[c], recons[i][c])


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_encode_reference_decode(tmp_path):
    w, h = 64, 64
    rng = np.random.default_rng(2)
    enc = Encoder(EncoderConfig(w, h, qp=32))
    stream = b"".join(enc.encode_frame(_synthetic_planes(w, h, t, rng), t)
                      for t in range(2))
    bs = tmp_path / "t.bin"
    bs.write_bytes(stream)
    out = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 2, out.stdout + out.stderr


def _moving_planes(w, h, t, base):
    y = base[t * 2:t * 2 + h, t * 3:t * 3 + w]
    u = np.full((h // 2, w // 2), 100 + t, np.int32)
    v = np.full((h // 2, w // 2), 140 - t, np.int32)
    return [y, u, v]


@pytest.mark.slow
def test_encode_p_slices_selfdecode():
    w, h, n = 64, 64, 4
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=8))
    stream = b""
    recons = []
    for t in range(n):
        stream += enc.encode_frame(_moving_planes(w, h, t, base), t)
        recons.append(enc.last_recon)
    dec = Decoder()
    pics = dec.decode_stream(stream)
    assert len(pics) == n
    for i, p in enumerate(pics):
        assert p.hash_ok is True
        for c in range(3):
            np.testing.assert_array_equal(p.planes[c], recons[i][c])


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_encode_p_slices_reference_decode(tmp_path):
    w, h, n = 64, 64, 4
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    enc = Encoder(EncoderConfig(w, h, qp=30, intra_period=8))
    stream = b"".join(enc.encode_frame(_moving_planes(w, h, t, base), t)
                      for t in range(n))
    bs = tmp_path / "p.bin"
    bs.write_bytes(stream)
    out = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == n, out.stdout + out.stderr


@pytest.mark.slow
def test_encode_ra_gop8_selfdecode(tmp_path):
    w, h, n = 64, 64, 9           # IDR + one full hierarchical GOP
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    enc = Encoder(EncoderConfig(w, h, qp=32, gop="ra8"))
    aus = []
    for t in range(n):
        aus += enc.push_frame(_moving_planes(w, h, t, base), t)
    aus += enc.flush()
    assert len(aus) == n
    stream = b"".join(aus)
    dec = Decoder()
    pics = dec.decode_stream(stream)
    assert sorted(p.poc for p in pics) == list(range(n))
    assert all(p.hash_ok for p in pics)
    if os.path.exists(HM_DEC):
        bs = tmp_path / "ra.bin"
        bs.write_bytes(stream)
        out = subprocess.run([HM_DEC, "-b", str(bs),
                              "-o", str(tmp_path / "o.yuv")],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == n, out.stdout + out.stderr


@pytest.mark.slow
def test_encode_rrsp_selfdecode():
    """RRSP fast partitioning is normatively transparent: the pruned
    encode still self-decodes bit-exactly (hash SEI green)."""
    w, h, n = 128, 128, 5
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    # mix of flat and detailed content so the depth votes vary
    base[: h, : w] = 128
    enc = Encoder(EncoderConfig(w, h, qp=37, intra_period=16,
                                sbd=False, rrsp=True))
    stream = b""
    recons = []
    for t in range(n):
        stream += enc.encode_frame(_moving_planes(w, h, t, base), t)
        recons.append(enc.last_recon)
    dec = Decoder()
    pics = dec.decode_stream(stream)
    assert len(pics) == n
    for i, p in enumerate(pics):
        assert p.hash_ok is True
        for c in range(3):
            np.testing.assert_array_equal(p.planes[c], recons[i][c])


def test_rrsp_prunes_search():
    """With homogenous content the RRSP masks must restrict depths
    (i.e. the algorithm actually engages, not just passes through)."""
    from hm16_2_tpu.encode.rrsp import RRSP
    ph = pw = 32                          # 128x128 pic -> 32x32 parts
    col_depth = np.zeros((ph, pw), np.int8)      # all 64x64 in ref pic
    cur_depth = np.zeros((ph, pw), np.int8)      # coded CTUs all depth 0
    cur_depth[:, 16:] = -1                       # right half uncoded

    from types import SimpleNamespace
    col = SimpleNamespace(depth=col_depth,
                          col_depth=np.zeros((ph, pw), np.int8),
                          is_intra=False)
    r = RRSP(cur_depth, col, qp=37, pic_w=128, pic_h=128)
    check64, only0 = r.ctu_state(64, 64)
    assert check64 and only0             # unanimous 64x64 votes, QP>35
    mask = r.quadrant_mask(64, 64, 0)
    assert mask[0] and not mask[2]       # 8x8 depths pruned away


@pytest.mark.parametrize("kw", [dict(wpp=True), dict(tile_cols=2, tile_rows=2),
                                dict(wpp=True, intra_period=8)])
@pytest.mark.slow
def test_encode_wpp_tiles_selfdecode(kw):
    """WPP / tile substreams: entry points, per-substream CABAC, context
    choreography — self-decode must stay bit-exact."""
    w, h, n = 192, 128, 3
    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    enc = Encoder(EncoderConfig(w, h, qp=30, **kw))
    stream = b""
    recons = []
    for t in range(n):
        stream += enc.encode_frame(_moving_planes(w, h, t, base), t)
        recons.append(enc.last_recon)
    dec = Decoder()
    pics = dec.decode_stream(stream)
    assert len(pics) == n
    for i, p in enumerate(pics):
        assert p.hash_ok is True, f"poc {i}"
        for c in range(3):
            np.testing.assert_array_equal(p.planes[c], recons[i][c])


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
@pytest.mark.parametrize("kw", [dict(wpp=True), dict(tile_cols=2, tile_rows=2)])
def test_encode_wpp_tiles_reference_decode(tmp_path, kw):
    # conformance floor: tile columns >= 256 luma wide, rows >= 64 tall
    w, h, n = (512, 128, 2) if "tile_cols" in kw else (192, 128, 3)
    rng = np.random.default_rng(22)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    enc = Encoder(EncoderConfig(w, h, qp=30, intra_period=8, **kw))
    stream = b"".join(enc.encode_frame(_moving_planes(w, h, t, base), t)
                      for t in range(n))
    bs = tmp_path / "t.bin"
    bs.write_bytes(stream)
    out = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == n, out.stdout + out.stderr


@pytest.mark.slow
def test_encode_main10_selfdecode():
    """Main10 encode: 10-bit planes through the same path (bit-depth
    plumbed through transforms/quant/intra/MC)."""
    w, h, n = 64, 64, 3
    rng = np.random.default_rng(3)
    base = rng.integers(0, 1024, (h * 2, w * 2)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    enc = Encoder(EncoderConfig(w, h, qp=32, bit_depth=10, intra_period=8))
    stream = b""
    for t in range(n):
        y = base[t:t + h, t * 2:t * 2 + w]
        u = np.full((h // 2, w // 2), 400, np.int32)
        v = np.full((h // 2, w // 2), 600, np.int32)
        stream += enc.encode_frame([y, u, v], t)
    pics = Decoder().decode_stream(stream)
    assert len(pics) == n and all(p.hash_ok for p in pics)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_cfg_gop_table_roundtrip(tmp_path):
    """The cfg's GOPEntry table (TEncCfg.h:49-88) drives the coding
    structure: lowdelay GOPSize-4 cfg produces its per-slot QP offsets and
    refs, and the stream decodes (OK) in the reference decoder."""
    import subprocess, sys
    bs = tmp_path / "gop.bin"
    r = subprocess.run(
        [sys.executable, "-m", "hm16_2_tpu.tools.encode",
         "-c", "/tmp/hmref/cfg/encoder_lowdelay_main.cfg",
         "-i", "/tmp/hevc_data/tiny64.yuv", "-wdt", "64", "-hgt", "64",
         "-f", "8", "-b", str(bs), "-q", "35"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 8, out.stdout


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_weighted_pred_fade(tmp_path):
    """WP analysis engages on a fade, saves bits vs no-WP, and the
    WP-signalled slice headers parse in the reference decoder
    (WeightPredAnalysis.cpp / xCodePredWeightTable parity)."""
    import subprocess
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    rng = np.random.default_rng(3)
    base = rng.integers(30, 220, (128, 192)).astype(np.float64)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    frames = []
    for t in range(4):
        y = np.clip(base * (1.0 - 0.13 * t), 0, 255).astype(np.int32)
        u = np.full((64, 96), 128, np.int32)
        frames.append([y, u, u.copy()])

    def run(wp):
        enc = Encoder(EncoderConfig(192, 128, qp=32, intra_period=0,
                                    weighted_pred=wp))
        return b"".join(enc.encode_frame([p.copy() for p in f], i)
                        for i, f in enumerate(frames))

    bs_wp, bs_no = run(True), run(False)
    assert len(bs_wp) < len(bs_no) * 0.97, (len(bs_wp), len(bs_no))
    pics = Decoder().decode_stream(bs_wp)
    assert len(pics) == 4 and all(p.hash_ok for p in pics)
    f = tmp_path / "wp.bin"
    f.write_bytes(bs_wp)
    out = subprocess.run([HM_DEC, "-b", str(f), "-o",
                          str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 4, out.stdout


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
@pytest.mark.parametrize("ip", [1, 0])
def test_multi_slice_encode(tmp_path, ip):
    """Multi-slice pictures (HM SliceMode 1, equal CTU runs): independent
    slice segments with own CABAC engines + segment addresses; the
    reference decoder verifies every picture hash."""
    import subprocess
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, (128, 192)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    frames = []
    for t in range(2):
        y = np.roll(base, 2 * t, 1)
        u = np.full((64, 96), 120 + 4 * t, np.int32)
        frames.append([y, u, u.copy()])
    enc = Encoder(EncoderConfig(192, 128, qp=32, intra_period=ip, slices=3))
    aus = [enc.encode_frame([p.copy() for p in f], i)
           for i, f in enumerate(frames)]
    pics = Decoder().decode_stream(b"".join(aus))
    assert len(pics) == 2 and all(p.hash_ok for p in pics)
    f = tmp_path / "ms.bin"
    f.write_bytes(b"".join(aus))
    out = subprocess.run([HM_DEC, "-b", str(f), "-o",
                          str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 2, out.stdout


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_sei_vui_timing(tmp_path):
    """VUI timing info + active-parameter-sets and pic-timing SEI: the
    reference decoder consumes them without warnings and verifies hashes
    (SEIwrite.cpp / TEncCavlc::codeVUI parity for the basics)."""
    import subprocess
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    rng = np.random.default_rng(6)
    y = rng.integers(0, 255, (64, 64)).astype(np.int32)
    u = np.full((32, 32), 128, np.int32)
    enc = Encoder(EncoderConfig(64, 64, qp=32, intra_period=1,
                                sei_timing=True))
    au = enc.encode_frame([y, u, u.copy()], 0)
    assert Decoder().decode_stream(au)[0].hash_ok
    f = tmp_path / "sei.bin"
    f.write_bytes(au)
    out = subprocess.run([HM_DEC, "-b", str(f), "-o",
                          str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 1, out.stdout


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_encode_444_transform_skip(tmp_path):
    """4:4:4 AI encode (incl. NxN with per-PU chroma modes and interleaved
    chroma TU coding) + 4x4 transform-skip evaluation; HM reference
    decoder verifies the hashes (BASELINE config 4 territory)."""
    import subprocess
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    rng = np.random.default_rng(11)
    y = np.where((np.arange(192)[None, :] // 3
                  + np.arange(128)[:, None] // 5) % 2, 235, 16) \
        .astype(np.int32)
    y[40:80, 60:120] = rng.integers(0, 255, (40, 60))
    u = np.full((128, 192), 128, np.int32)
    for tskip in (False, True):
        enc = Encoder(EncoderConfig(192, 128, qp=27, intra_period=1,
                                    chroma_format=3, transform_skip=tskip))
        au = enc.encode_frame([y.copy(), u.copy(), u.copy()], 0)
        assert Decoder().decode_stream(au)[0].hash_ok, f"tskip={tskip}"
        f = tmp_path / f"c444_{tskip}.bin"
        f.write_bytes(au)
        out = subprocess.run([HM_DEC, "-b", str(f), "-o",
                              str(tmp_path / "o.yuv")],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == 1, out.stdout


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_amp_partitions(tmp_path, monkeypatch):
    """AMP (2NxnU/2NxnD/nLx2N/nRx2N) inter partitions: the fast-AMP trial
    (deriveTestModeAMP, TEncCu.cpp:1676-1712) picks asymmetric PUs on an
    off-center two-band motion scene, the part_mode AMP suffix (9.3.3.6)
    round-trips in our decoder, and the reference decoder verifies.
    Pinned to the per-CU search path: the fused inter frame plan
    (inter_plan.py) decides 2Nx2N/partitions on its own grid."""
    monkeypatch.setenv("HM16_NO_INTER_PLAN", "1")
    from collections import Counter
    from hm16_2_tpu.encode import top as enctop

    cnt = Counter()
    orig_commit = enctop.CtuSearch._commit_inter_candidate

    def spy(self, px, py, log2, kind, payload, uni):
        ok = orig_commit(self, px, py, log2, kind, payload, uni)
        if ok and kind == "part":
            cnt[payload[0]] += 1
        return ok

    enctop.CtuSearch._commit_inter_candidate = spy
    try:
        rng = np.random.default_rng(9)
        h, w = 128, 192
        yy, xx = np.mgrid[0:h, 0:w]
        tex = 120 + 50 * np.sin(xx / 13.0) * np.cos(yy / 7.0) \
            + rng.normal(0, 3, (h, w))
        frames = []
        for t in range(6):
            y = tex.copy()
            cut = 40 + 3 * t              # moving off-center band split
            y[:cut] = np.roll(tex[:cut], 4 * t, axis=1)
            y[cut:] = np.roll(tex[cut:], -2 * t, axis=1)
            frames.append([y.clip(0, 255).astype(np.int32),
                           np.full((h // 2, w // 2), 110, np.int32),
                           np.full((h // 2, w // 2), 135, np.int32)])
        enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=0))
        bs = b"".join(enc.encode_frame([p.copy() for p in f], i)
                      for i, f in enumerate(frames))
    finally:
        enctop.CtuSearch._commit_inter_candidate = orig_commit

    assert any(cnt[m] for m in (4, 5, 6, 7)), dict(cnt)
    pics = Decoder().decode_stream(bs)
    assert len(pics) == 6 and all(p.hash_ok for p in pics)
    f = tmp_path / "amp.bin"
    f.write_bytes(bs)
    out = subprocess.run([HM_DEC, "-b", str(f), "-o",
                          str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 6, out.stdout


@pytest.mark.parametrize("kw", [
    dict(qp=30), dict(qp=18), dict(qp=42),
    dict(qp=30, transform_skip=True),
    dict(qp=27, bit_depth=10),
])
def test_encode_422_selfdecode(kw):
    """4:2:2 AI encode: the double-high chroma block of each TU is coded
    as two square sub-TUs with per-half cbf sub-flags and the 4:2:2
    chroma-mode angle mapping (TComTU.h:48-162, TComChromaFormat;
    encode dual of the golden-verified decode path)."""
    bd = kw.get("bit_depth", 8)
    mx = (1 << bd) - 1
    w, h = 192, 128
    rng = np.random.default_rng(7)
    enc = Encoder(EncoderConfig(w, h, intra_period=1, chroma_format=2, **kw))
    aus = b""
    for t in range(2):
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        y = np.clip(((xx * 2 + yy + 9 * t) % 256 * 0.6
                     + 0.4 * rng.integers(0, 256, (h, w)))
                    * (mx / 255), 0, mx).astype(np.int32)
        u = np.clip((((xx // 2 + t) % 256)[:, ::2]) * (mx / 255),
                    0, mx).astype(np.int32)
        v = np.clip((((yy // 3) % 256)[:, ::2]) * (mx / 255),
                    0, mx).astype(np.int32)
        aus += enc.encode_frame([y, u, v], t)
    pics = Decoder().decode_stream(aus)
    assert len(pics) == 2 and all(p.hash_ok for p in pics), kw


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_encode_422_reference_decode(tmp_path):
    """HM reference decoder verifies hashes of our 4:2:2 stream (Main-RExt
    profile signalling, rext_profile_ptl)."""
    w, h = 184, 120          # non-CTU-aligned
    rng = np.random.default_rng(3)
    enc = Encoder(EncoderConfig(w, h, qp=33, intra_period=1,
                                chroma_format=2))
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = ((xx + 2 * yy) % 256).astype(np.int32)
    u = rng.integers(0, 256, (h, w // 2)).astype(np.int32)
    v = ((yy // 3) % 256)[:, ::2].astype(np.int32)
    au = enc.encode_frame([y, u, v], 0)
    assert Decoder().decode_stream(au)[0].hash_ok
    f = tmp_path / "c422.bin"
    f.write_bytes(au)
    out = subprocess.run([HM_DEC, "-b", str(f), "-o",
                          str(tmp_path / "o.yuv")],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 1, out.stdout


@pytest.mark.slow
def test_ra_sibling_pipelined_selfdecode():
    """Hierarchical-B sibling overlap: pictures whose references are all
    committed get their fused inter plan dispatched while the previous
    picture commits (in RA GOP8 coding order: 3, 6 and 7).  The stream
    must stay valid and self-consistent."""
    import hm16_2_tpu.encode.top as T
    cnt = [0]
    orig = T.Encoder._predispatch_ra

    def counting(self, *a, **kw):
        r = orig(self, *a, **kw)
        if r is not None:
            cnt[0] += 1
        return r

    T.Encoder._predispatch_ra = counting
    try:
        rng = np.random.default_rng(3)
        w, h = 192, 128
        base = rng.integers(0, 200, (h, w)).astype(np.int32)
        frames = []
        for t in range(9):
            y = np.clip(np.roll(base, t * 2, axis=1)
                        + rng.integers(0, 20, (h, w)), 0, 255) \
                .astype(np.int32)
            frames.append([y, np.full((h // 2, w // 2), 100, np.int32),
                           np.full((h // 2, w // 2), 140, np.int32)])
        enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=-1,
                                    gop="ra8"))
        aus = b"".join(enc.encode_stream(frames))
    finally:
        T.Encoder._predispatch_ra = orig
    pics = Decoder().decode_stream(aus)
    assert cnt[0] == 3                      # pictures 3, 6, 7
    assert len(pics) == 9 and all(p.hash_ok for p in pics)


@pytest.mark.slow
@pytest.mark.parametrize("kw", [dict(intra_period=1),
                                dict(intra_period=-1, gop="ld")])
def test_delta_qp_rd(kw):
    """DeltaQpRD=1 (TEncSlice::precompressSlice): three QP trials per
    picture, winner re-encoded; stream decodes with matching hashes."""
    rng = np.random.default_rng(3)
    w, h = 128, 96
    base = rng.integers(0, 200, (h, w)).astype(np.int32)
    frames = []
    for t in range(2):
        y = np.clip(np.roll(base, t * 2, axis=1)
                    + rng.integers(0, 25, (h, w)), 0, 255).astype(np.int32)
        frames.append([y, np.full((h // 2, w // 2), 100, np.int32),
                       np.full((h // 2, w // 2), 140, np.int32)])
    enc = Encoder(EncoderConfig(w, h, qp=32, delta_qp_rd=1, **kw))
    aus = b"".join(enc.encode_stream(frames))
    pics = Decoder().decode_stream(aus)
    assert len(pics) == 2 and all(p.hash_ok for p in pics)


@pytest.mark.slow
def test_long_term_ref(tmp_path):
    """Long-term 'golden' reference (LD): the IDR anchor stays in every
    P slice's list as a long-term picture (slice-header LT signalling,
    LT-aware MV-prediction rules).  On content that returns to the
    anchor scene the LTR stream is smaller."""
    rng = np.random.default_rng(3)
    w, h = 128, 96
    base = rng.integers(0, 200, (h, w)).astype(np.int32)
    frames = []
    for t in range(6):
        shift = [0, 4, 8, 12, 16, 0][t]
        y = np.clip(np.roll(base, shift, axis=1)
                    + rng.integers(0, 15, (h, w)), 0, 255).astype(np.int32)
        frames.append([y, np.full((h // 2, w // 2), 100, np.int32),
                       np.full((h // 2, w // 2), 140, np.int32)])
    enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=-1, gop="ld",
                                long_term_ref=True))
    aus = b"".join(enc.encode_stream(frames))
    pics = Decoder().decode_stream(aus)
    assert len(pics) == 6 and all(p.hash_ok for p in pics)
    enc2 = Encoder(EncoderConfig(w, h, qp=32, intra_period=-1, gop="ld"))
    aus2 = b"".join(enc2.encode_stream(frames))
    assert len(aus) < len(aus2)     # the golden frame pays off
    if os.path.exists(HM_DEC):
        f = tmp_path / "ltr.bin"
        f.write_bytes(aus)
        out = subprocess.run([HM_DEC, "-b", str(f), "-o", "/dev/null"],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == 6, out.stdout


@pytest.mark.slow
def test_encode_422_inter_selfdecode(tmp_path):
    """4:2:2 INTER encode (LD): double-high chroma residual as two
    square sub-TUs on the P/B path (decode dual _accum_inter_resi
    sub422), chroma MC through the shared normative path."""
    rng = np.random.default_rng(3)
    w, h = 128, 96
    base = rng.integers(0, 200, (h, w)).astype(np.int32)
    cbase = rng.integers(0, 220, (h, w // 2)).astype(np.int32)
    frames = []
    for t in range(5):
        y = np.clip(np.roll(base, t * 3, axis=1)
                    + rng.integers(0, 12, (h, w)), 0, 255).astype(np.int32)
        u = np.clip(np.roll(cbase, t * 2, axis=1)
                    + rng.integers(0, 8, (h, w // 2)), 0,
                    255).astype(np.int32)
        v = np.clip(np.roll(cbase, -t, axis=0)
                    + rng.integers(0, 8, (h, w // 2)), 0,
                    255).astype(np.int32)
        frames.append([y, u, v])
    enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=-1, gop="ld",
                                chroma_format=2))
    aus = b"".join(enc.encode_stream(frames))
    pics = Decoder().decode_stream(aus)
    assert len(pics) == 5 and all(p.hash_ok for p in pics)
    if os.path.exists(HM_DEC):
        f = tmp_path / "i422.bin"
        f.write_bytes(aus)
        out = subprocess.run([HM_DEC, "-b", str(f), "-o", "/dev/null"],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == 5, out.stdout


@pytest.mark.slow
def test_radl_leading_pictures(tmp_path):
    """RADL derivation (TEncGOP getNalUnitType): a leading picture that
    references only the CRA (or other RADLs) is coded RADL_R; ones that
    reach behind the CRA stay RASL_R."""
    from hm16_2_tpu.bitstream.bitio import split_annexb
    from hm16_2_tpu.headers.params import NAL_RADL_R
    rng = np.random.default_rng(3)
    w, h = 128, 96
    base = rng.integers(0, 200, (h, w)).astype(np.int32)
    frames = []
    for t in range(9):
        y = np.clip(np.roll(base, t * 2, axis=1)
                    + rng.integers(0, 12, (h, w)), 0, 255).astype(np.int32)
        frames.append([y, np.full((h // 2, w // 2), 100, np.int32),
                       np.full((h // 2, w // 2), 140, np.int32)])
    tbl = [dict(poc=2, qpoff=1, qpfac=0.5, refs=(-2,), n_active=1,
                depth=0),
           dict(poc=1, qpoff=2, qpfac=0.5, refs=(1,), n_active=1,
                depth=1)]
    enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=4, gop="ra8",
                                gop_table=tbl))
    aus = b"".join(enc.encode_stream(frames))
    types = [((n[0] >> 1) & 0x3F) for n in split_annexb(aus)
             if ((n[0] >> 1) & 0x3F) < 32]
    assert NAL_RADL_R in types, types
    pics = Decoder().decode_stream(aus)
    assert len(pics) == 9 and all(p.hash_ok for p in pics)
    if os.path.exists(HM_DEC):
        f = tmp_path / "radl.bin"
        f.write_bytes(aus)
        out = subprocess.run([HM_DEC, "-b", str(f), "-o", "/dev/null"],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == 9, out.stdout


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
@pytest.mark.parametrize("kw", [
    dict(deblock_beta_offset=3, deblock_tc_offset=-2),
    dict(intra_smoothing_disabled=True),
])
def test_deblock_offsets_and_smoothing_disable(tmp_path, kw):
    """PPS deblocking offsets (LoopFilterBetaOffset_div2/TcOffset_div2)
    and RExt IntraReferenceSmoothing=0 signalling + behavior."""
    rng = np.random.default_rng(1)
    w, h = 128, 96
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    u = np.full((h // 2, w // 2), 100, np.int32)
    v = np.full((h // 2, w // 2), 140, np.int32)
    enc = Encoder(EncoderConfig(w, h, qp=34, intra_period=1, **kw))
    au = enc.encode_frame([y, u, v], 0)
    assert Decoder().decode_stream(au)[0].hash_ok
    f = tmp_path / "dbo.bin"
    f.write_bytes(au)
    out = subprocess.run([HM_DEC, "-b", str(f), "-o", "/dev/null"],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 1, out.stdout
