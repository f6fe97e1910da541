"""CABAC engine round-trip tests: encoder and decoder must be exact duals."""

import numpy as np
import pytest

from hm16_2_tpu.bitstream.bitio import BitReader, BitWriter
from hm16_2_tpu.bitstream.cabac import (
    B_SLICE, I_SLICE, CabacCounter, CabacDecoder, CabacEncoder, ByteFifo,
    ContextSet, NUM_CTX,
)


def _random_script(rng, n_ops):
    """A mixed script of (kind, payload) CABAC operations."""
    ops = []
    for _ in range(n_ops):
        kind = rng.choice(["ctx", "ep", "eps", "trm0"])
        if kind == "ctx":
            ops.append(("ctx", int(rng.integers(0, NUM_CTX)), int(rng.integers(0, 2))))
        elif kind == "ep":
            ops.append(("ep", int(rng.integers(0, 2))))
        elif kind == "eps":
            n = int(rng.integers(1, 17))
            ops.append(("eps", n, int(rng.integers(0, 1 << n))))
        else:
            ops.append(("trm0",))
    return ops


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cabac_roundtrip(seed):
    rng = np.random.default_rng(seed)
    ops = _random_script(rng, 2000)

    enc_ctx = ContextSet(I_SLICE, 32)
    bw = BitWriter()
    enc = CabacEncoder(bw, enc_ctx)
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(op[2], op[1])
        elif op[0] == "ep":
            enc.encode_bin_ep(op[1])
        elif op[0] == "eps":
            enc.encode_bins_ep(op[2], op[1])
        else:
            enc.encode_bin_trm(0)
    enc.flush_with_stop_bit()
    data = bw.get_bytes()

    dec_ctx = ContextSet(I_SLICE, 32)
    dec = CabacDecoder(ByteFifo(data), dec_ctx)
    for op in ops:
        if op[0] == "ctx":
            assert dec.decode_bin(op[1]) == op[2]
        elif op[0] == "ep":
            assert dec.decode_bin_ep() == op[1]
        elif op[0] == "eps":
            assert dec.decode_bins_ep(op[1]) == op[2]
        else:
            assert dec.decode_bin_trm() == 0
    assert dec.decode_bin_trm() == 1
    # context state trajectories must match exactly
    np.testing.assert_array_equal(enc_ctx.state, dec_ctx.state)


def test_cabac_aligned_ep_roundtrip():
    rng = np.random.default_rng(7)
    enc_ctx = ContextSet(B_SLICE, 27)
    bw = BitWriter()
    enc = CabacEncoder(bw, enc_ctx)
    vals = [(int(rng.integers(1, 25)), None) for _ in range(200)]
    vals = [(n, int(rng.integers(0, 1 << n))) for n, _ in vals]
    enc.align()
    for n, v in vals:
        enc.encode_bins_ep(v, n)  # range==256 -> aligned path
    enc.flush_with_stop_bit()
    data = bw.get_bytes()

    dec = CabacDecoder(ByteFifo(data), ContextSet(B_SLICE, 27))
    dec.align()
    for n, v in vals:
        assert dec.decode_bins_ep(n) == v
    assert dec.decode_bin_trm() == 1


def test_counter_tracks_encoder_states():
    rng = np.random.default_rng(3)
    ops = _random_script(rng, 500)
    ctx_a = ContextSet(I_SLICE, 22)
    ctx_b = ContextSet(I_SLICE, 22)
    enc = CabacEncoder(BitWriter(), ctx_a)
    cnt = CabacCounter(ctx_b)
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(op[2], op[1])
            cnt.encode_bin(op[2], op[1])
        elif op[0] == "ep":
            enc.encode_bin_ep(op[1])
            cnt.encode_bin_ep(op[1])
        elif op[0] == "eps":
            enc.encode_bins_ep(op[2], op[1])
            cnt.encode_bins_ep(op[2], op[1])
    np.testing.assert_array_equal(ctx_a.state, ctx_b.state)
    assert cnt.bits() > 0


def test_expgolomb_roundtrip():
    bw = BitWriter()
    vals = list(range(40)) + [100, 1000, 65534]
    svals = [0, 1, -1, 5, -5, 200, -200]
    for v in vals:
        bw.ue(v)
    for v in svals:
        bw.se(v)
    bw.byte_align_with_stop_bit()
    br = BitReader(bw.get_bytes())
    for v in vals:
        assert br.ue() == v
    for v in svals:
        assert br.se() == v
