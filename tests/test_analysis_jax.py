"""Batched JAX analysis kernels must match the scalar reference ops exactly."""

import numpy as np
import pytest

from hm16_2_tpu.ops import analysis, intra_ref, transforms_ref
from hm16_2_tpu.ops.satd import satd_block


@pytest.mark.parametrize("size", [4, 8, 16])   # 32 covered by nightly/slow
def test_predict_all_modes_matches_reference(size):
    rng = np.random.default_rng(size)
    n = 5
    tops_u = rng.integers(0, 256, (n, 2 * size + 1)).astype(np.int64)
    lefts_u = rng.integers(0, 256, (n, 2 * size + 1)).astype(np.int64)
    lefts_u[:, 0] = tops_u[:, 0]
    tops_f = np.zeros_like(tops_u)
    lefts_f = np.zeros_like(lefts_u)
    for i in range(n):
        tops_f[i], lefts_f[i] = intra_ref.filter_reference_samples(
            tops_u[i], lefts_u[i], size, 8, strong_enabled=False)

    bufs = analysis.pack_ref_buffers(tops_u, lefts_u, tops_f, lefts_f)
    preds = np.asarray(analysis.predict_all_modes(bufs, size, True, 8))

    for i in range(n):
        for mode in range(35):
            if intra_ref.should_filter(mode, size, True):
                t, l = tops_f[i], lefts_f[i]
            else:
                t, l = tops_u[i], lefts_u[i]
            ref = intra_ref.predict_intra(mode, t, l, size, 8, True)
            np.testing.assert_array_equal(
                preds[i, mode], ref, err_msg=f"mode {mode} block {i}")


def test_batched_satd_matches_reference():
    rng = np.random.default_rng(0)
    for size in (4, 8, 16):
        d = rng.integers(-255, 256, (3, size, size)).astype(np.int32)
        got = np.asarray(analysis.batched_satd(d))
        want = np.array([satd_block(x.astype(np.int64)) for x in d])
        np.testing.assert_array_equal(got, want)


def test_batched_fwd_transform_matches_reference():
    rng = np.random.default_rng(1)
    for size, dst in [(4, False), (4, True), (8, False), (16, False)]:
        r = rng.integers(-255, 256, (3, size, size)).astype(np.int32)
        got = np.asarray(analysis.batched_fwd_transform(r, 8, dst))
        want = np.stack([transforms_ref.forward_transform(x.astype(np.int64), 8, dst)
                         for x in r])
        np.testing.assert_array_equal(got, want)


def test_batched_quant_matches_reference():
    rng = np.random.default_rng(2)
    for size in (4, 8, 16):
        log2 = size.bit_length() - 1
        c = rng.integers(-30000, 30000, (3, size, size)).astype(np.int32)
        got = np.asarray(analysis.batched_quant(c, np.int32(32), 8, log2, True))
        want = np.stack([transforms_ref.quant(x.astype(np.int64), 32, 8, log2, True)
                         for x in c])
        np.testing.assert_array_equal(got, want)


def test_stats_per_tu_size_breakdown(tmp_path):
    """The analyser decoder splits residual syntax classes per TU size
    (TComCodingStatistics per-size taxonomy)."""
    import os
    import numpy as np
    from hm16_2_tpu.bitstream import cabac
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    rng = np.random.default_rng(2)
    w, h = 128, 96
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    enc = Encoder(EncoderConfig(w, h, qp=30, intra_period=1))
    au = enc.encode_frame([y, np.full((h // 2, w // 2), 99, np.int32),
                           np.full((h // 2, w // 2), 150, np.int32)], 0)
    cabac.STATS = cabac.BitStats()
    try:
        Decoder().decode_stream(au)
        keys = set(cabac.STATS.bits)
    finally:
        cabac.STATS = None
    assert any(k.startswith("sig[y") for k in keys), sorted(keys)
    assert any("[c" in k for k in keys), sorted(keys)
