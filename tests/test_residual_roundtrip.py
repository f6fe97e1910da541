"""Residual-coding round-trip fuzz: CtuEncoder._enc_residual and
SliceDecoder._parse_residual must be exact duals for arbitrary level maps."""

import numpy as np
import pytest

from hm16_2_tpu.bitstream.bitio import BitWriter
from hm16_2_tpu.bitstream.cabac import (
    ByteFifo, CabacDecoder, CabacEncoder, ContextSet)
from hm16_2_tpu.decode.ctu_dec import SliceDecoder
from hm16_2_tpu.decode.picture import MODE_INTRA, PictureState
from hm16_2_tpu.encode.ctu_enc import CtuEncoder
from hm16_2_tpu.encode.top import build_sps_pps, EncoderConfig
from hm16_2_tpu.headers.params import I_SLICE, SliceHeader


def _make_env(levels, comp=0, mode=12, sign_hiding=False, tskip=0):
    size = levels.shape[0]
    cfg = EncoderConfig(64, 64, qp=32)
    sps, pps = build_sps_pps(cfg)
    pps.sign_data_hiding = 1 if sign_hiding else 0
    pps.transform_skip_enabled = 1 if tskip else 0
    sh = SliceHeader()
    sh.slice_type = I_SLICE
    sh.qp = 32
    sh.sps, sh.pps = sps, pps

    def setup(pic):
        pic.pred_mode[:] = MODE_INTRA
        pic.intra_luma[:] = mode
        pic.intra_chroma[:] = mode
        pic.qp[:] = 32
        sx = pic.comp_shift[comp][0]
        csize = size
        lsize = size << (sx if comp else 0)
        x0 = y0 = 0
        pic.coeff[comp][:csize, :csize] = levels
        if tskip:
            pic.tskip[comp][: lsize // 4, : lsize // 4] = 1
        return lsize

    class FakeCU:
        pred_mode = MODE_INTRA
        part_size = 0
        tqb = 0
        px = py = 0
        log2 = 6
    return cfg, sps, pps, sh, setup, FakeCU()


def _precondition_sign_hiding(levels, mode, size, comp):
    """Enforce the sign-hiding invariant the quantizer guarantees
    (signBitHidingHDQ): in each CG where hiding applies, the hidden
    (first-in-scan) coefficient's sign must equal the abs-sum parity."""
    from hm16_2_tpu.common.tables import get_scan, SCAN_DIAG, SCAN_HOR, SCAN_VER
    from hm16_2_tpu.ops.intra_ref import HOR_IDX, VER_IDX
    w = size
    if w <= 8 and (comp == 0 or w <= 4):
        if abs(mode - VER_IDX) <= 4:
            st = SCAN_HOR
        elif abs(mode - HOR_IDX) <= 4:
            st = SCAN_VER
        else:
            st = SCAN_DIAG
    else:
        st = SCAN_DIAG
    scan = get_scan(w, w, st, grouped=True)
    flat = levels.ravel()
    for sub in range((w * w) // 16):
        idxs = scan[sub * 16:(sub + 1) * 16]
        nz = [i for i, b in enumerate(idxs) if flat[b] != 0]
        if not nz:
            continue
        first, last = nz[0], nz[-1]
        if last - first >= 4:
            abssum = int(np.abs(flat[idxs]).sum())
            hidden = idxs[first]
            want_neg = bool(abssum & 1)
            if (flat[hidden] < 0) != want_neg:
                flat[hidden] = -flat[hidden]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("size,comp", [(4, 0), (8, 0), (16, 0), (32, 0),
                                       (4, 1), (8, 1), (16, 1)])
def test_residual_roundtrip(seed, size, comp):
    rng = np.random.default_rng(seed * 100 + size + comp)
    # mix of sparse small and occasional large levels
    levels = rng.integers(-2, 3, (size, size)).astype(np.int64)
    levels *= rng.random((size, size)) < 0.4
    if seed % 2:
        big = rng.integers(0, size, (4, 2))
        for y, x in big:
            levels[y, x] = int(rng.integers(-100, 100))
    if not np.any(levels):
        levels[0, 0] = 1
    mode = int(rng.integers(0, 35))
    sign_hiding = bool(seed % 3 == 0)
    if sign_hiding:
        _precondition_sign_hiding(levels, mode, size, comp)

    cfg, sps, pps, sh, setup, cu = _make_env(levels, comp, mode, sign_hiding)

    pic_e = PictureState(sps, pps)
    setup(pic_e)
    enc = CtuEncoder(pic_e, sh, 0)
    bw = BitWriter()
    cab = CabacEncoder(bw, ContextSet(I_SLICE, 32))
    enc.attach(cab)
    log2 = (size << (pic_e.comp_shift[comp][0] if comp else 0)).bit_length() - 1
    enc._enc_residual(cu, 0, 0, log2, comp)
    cab.flush_with_stop_bit()
    data = bw.get_bytes()

    pic_d = PictureState(sps, pps)
    setup(pic_d)
    dec = SliceDecoder(pic_d, sh, 0)
    dec.ctx = ContextSet(I_SLICE, 32)
    dec.dec = CabacDecoder(ByteFifo(data), dec.ctx)
    dec._parse_residual(cu, 0, 0, log2, comp)
    assert dec.dec.decode_bin_trm() == 1, "stream desync (terminator lost)"
    got = pic_d.coeff[comp][:size, :size]
    np.testing.assert_array_equal(got, levels)


def test_bad_block_regression():
    # historical failure shape: dense mid-magnitude 16x16 levels with mixed
    # signs (reproduced deterministically instead of from a capture file)
    rng = np.random.default_rng(1234)
    levels = rng.integers(-9, 10, size=(16, 16)).astype(np.int32)
    levels[0, 0] = 37
    cfg, sps, pps, sh, setup, cu = _make_env(levels, 0, 6, False)
    pic_e = PictureState(sps, pps)
    setup(pic_e)
    enc = CtuEncoder(pic_e, sh, 0)
    bw = BitWriter()
    cab = CabacEncoder(bw, ContextSet(I_SLICE, 32))
    enc.attach(cab)
    enc._enc_residual(cu, 0, 0, 4, 0)
    cab.flush_with_stop_bit()
    pic_d = PictureState(sps, pps)
    setup(pic_d)
    pic_d.coeff[0][:] = 0
    dec = SliceDecoder(pic_d, sh, 0)
    dec.ctx = ContextSet(I_SLICE, 32)
    dec.dec = CabacDecoder(ByteFifo(bw.get_bytes()), dec.ctx)
    dec._parse_residual(cu, 0, 0, 4, 0)
    assert dec.dec.decode_bin_trm() == 1
    np.testing.assert_array_equal(pic_d.coeff[0][:16, :16], levels)
