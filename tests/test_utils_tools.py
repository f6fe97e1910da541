"""App-utils parity: annexBbytecount / convert_NtoMbit_YCbCr /
BitrateTargeting duals."""

import numpy as np

from hm16_2_tpu.tools.annexb_bytecount import count
from hm16_2_tpu.tools.bitrate_targeting import guess_lambda_modifiers
from hm16_2_tpu.tools.convert_bitdepth import convert_plane


def test_annexb_count():
    from hm16_2_tpu.bitstream.bitio import write_annexb
    nals = [bytes([32 << 1, 1]) + b"x" * 10,    # VPS
            bytes([19 << 1, 1]) + b"y" * 100]   # IDR
    data = write_annexb(nals)
    per_type, total_nal, sc = count(data)
    assert per_type[32] == [1, 12]
    assert per_type[19] == [1, 102]
    assert sc == len(data) - total_nal


def test_convert_bitdepth_roundtrip():
    rng = np.random.default_rng(0)
    p8 = rng.integers(0, 256, (16, 16)).astype(np.int32)
    p10 = convert_plane(p8, 8, 10)
    assert p10.max() <= 1023 and np.array_equal(p10, p8 << 2)
    back = convert_plane(p10, 10, 8)
    np.testing.assert_array_equal(back, p8)
    # down-shift rounds to nearest
    assert convert_plane(np.array([3]), 10, 8)[0] == 1


def test_lambda_modifier_convergence():
    """Simulated encoder with bitrate ~ C/modifier: the guess loop must
    approach the target bitrate within a few iterations."""
    targets = [1000.0]
    C = 800.0

    def encode(mods):
        return [C / m for m in mods]

    meta = []
    mods = [1.0]
    meta.append((mods, encode(mods)))
    for _ in range(8):
        mods = guess_lambda_modifiers(0.5, targets, meta)
        meta.append((mods, encode(mods)))
    achieved = meta[-1][1][0]
    assert abs(achieved - targets[0]) / targets[0] < 0.05
    # multi-layer: inter dampening keeps later layers stable
    t2 = [1000.0, 500.0]
    meta2 = [([1.0, 1.0], [800.0, 300.0])]
    m2 = guess_lambda_modifiers(0.5, t2, meta2)
    assert len(m2) == 2 and all(m > 0 for m in m2)


def test_yuv_io_conversions(tmp_path):
    """TVideoIOYuv surface: bit-depth scaling, MSB-extended input,
    420<->444 conversion, skipFrames, field split/weave."""
    import io
    import numpy as np
    from hm16_2_tpu.io import yuv

    rng = np.random.default_rng(2)
    y = rng.integers(0, 256, (16, 24)).astype(np.int32)
    u = rng.integers(0, 256, (8, 12)).astype(np.int32)
    v = rng.integers(0, 256, (8, 12)).astype(np.int32)

    # round trip with 8-bit file, 10-bit internal
    buf = io.BytesIO()
    yuv.write_yuv_frame(buf, [y, u, v], [8, 8, 8])
    buf.seek(0)
    got = yuv.read_yuv_frame(buf, 24, 16, 1, 8, internal_bit_depth=10)
    assert (got[0] == (y << 2)).all()

    # MSB-extended 16-bit file carrying 10-bit content
    buf = io.BytesIO()
    y10 = (y << 2).astype(np.int32)
    yuv.write_yuv_frame(buf, [y10 << 6, (u << 2) << 6, (v << 2) << 6],
                        [16, 16, 16])
    buf.seek(0)
    got = yuv.read_yuv_frame(buf, 24, 16, 1, 16, internal_bit_depth=10,
                             msb_extended=True)
    assert (got[0] == y10).all()

    # 420 file -> 444 internal and back
    p444 = yuv.convert_chroma_format([y, u, v], 1, 3)
    assert p444[1].shape == y.shape
    back = yuv.convert_chroma_format(p444, 3, 1)
    assert (back[1] == u).all() and (back[2] == v).all()

    # skipFrames + second-frame read
    buf = io.BytesIO()
    yuv.write_yuv_frame(buf, [y, u, v], [8, 8, 8])
    y2 = (y + 1) & 255
    yuv.write_yuv_frame(buf, [y2, u, v], [8, 8, 8])
    buf.seek(0)
    yuv.skip_frames(buf, 1, 24, 16, 1, 8)
    got = yuv.read_yuv_frame(buf, 24, 16, 1, 8)
    assert (got[0] == y2).all()

    # fields
    top, bot = yuv.split_fields([y, u, v])
    woven = yuv.interleave_fields(top, bot)
    assert (woven[0] == y).all()


def test_decoder_bit_stats(capsys):
    """Analyser-decoder statistics (TComCodingStatistics analogue): the
    per-syntax table accounts for the stream's CABAC bins."""
    import os
    import pytest
    path = "/tmp/hevc_data/tiny64_ai.bin"
    if not os.path.exists(path):
        pytest.skip("fixtures absent")
    from hm16_2_tpu.tools import decode as dec_cli
    rc = dec_cli.main([path, "--stats"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Decoder statistics" in out and "sig" in out
    from hm16_2_tpu.bitstream import cabac
    assert cabac.STATS is None          # cleaned up after printing


def test_fit_bits_model_regenerates():
    """The plan bit-model's provenance script runs and reaches a high-R^2
    fit against the exact counting-coder oracle (intra_rd._bits_estimate
    regeneration path)."""
    import numpy as np
    from hm16_2_tpu.tools import fit_bits_model as F
    X, Y = F.collect(frames=1, seed=7)
    assert len(Y) > 50
    coef, *_ = np.linalg.lstsq(X, Y, rcond=None)
    pred = X @ coef
    r2 = 1.0 - float(((Y - pred) ** 2).sum()) / \
        float(((Y - Y.mean()) ** 2).sum())
    assert r2 > 0.97, r2
