"""Frame-level batched intra RD decision (the TPU encode path).

HM's encoder walks the CU quadtree depth-first, trial-encoding every
candidate against running CABAC contexts (TEncCu.cpp:466 xCompressCU,
TEncSearch.cpp:2289 estIntraPredQT).  That search is wavefront-sequential
and cannot batch.  Here the whole frame's candidate CUs are evaluated at
once per size on the accelerator:

  stage 1 (jitted, per TU size 4/8/16/32):
      reference assembly from ORIGINAL pixels -> all-35-mode prediction
      (gather tables) -> SATD -> top-K candidate modes -> forward
      transform + quant + dequant + inverse transform (integer matmuls on
      the MXU) -> true SSE distortion + estimated CABAC bits
  stage 2 (host, numpy): bottom-up quadtree DP — leaf-vs-split argmin per
      node, including the 8x8 2Nx2N-vs-NxN (4x4 PU) decision
  stage 3 (caller): z-order commit pass reconstructs the chosen CUs
      bit-exactly with reconstructed-pixel references and emits CABAC.

The candidate evaluation uses original-pixel references and estimated
(context-free) bit costs — the classic hardware-encoder tradeoff flagged
in SURVEY.md section 7; the commit pass keeps the bitstream and the
reconstruction normative.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from hm16_2_tpu._jaxcache import ensure_cache

ensure_cache()

import jax
import jax.numpy as jnp

from hm16_2_tpu.common.tables import DCT, DST4, INV_QUANT_SCALES, QUANT_SCALES
from hm16_2_tpu.ops import analysis

TRANSFORM_MATRIX_SHIFT = 6


# ---------------------------------------------------------------------------
# batched integer transform pipeline (duals of ops.transforms_ref)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("bit_depth", "log2_tr", "qp"))
def batched_dequant(levels, qp: int, bit_depth: int, log2_tr: int):
    """Flat-matrix dequant (transforms_ref.dequant, scaling list None)."""
    per, rem = qp // 6, qp % 6
    max_dr = 15
    tshift = max_dr - bit_depth - log2_tr
    right_shift = 6 - (tshift + per)
    scale = int(INV_QUANT_SCALES[rem])
    target_bd = min(max_dr + 1, 32 + right_shift - 7)
    imin, imax = -(1 << (target_bd - 1)), (1 << (target_bd - 1)) - 1
    q = jnp.clip(levels.astype(jnp.int32), imin, imax)
    if right_shift > 0:
        out = (q * scale + (1 << (right_shift - 1))) >> right_shift
    else:
        out = (q * scale) << (-right_shift)
    return jnp.clip(out, -(1 << max_dr), (1 << max_dr) - 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("bit_depth", "use_dst"))
def batched_inv_transform(coeffs, bit_depth: int, use_dst: bool):
    """Inverse 2-D transform with HM's intermediate clamps (xITrMxN)."""
    s = coeffs.shape[-1]
    t = jnp.asarray((DST4 if (use_dst and s == 4) else DCT[s]).astype(np.int32))
    max_dr = 15
    s1 = TRANSFORM_MATRIX_SHIFT + 1
    s2 = (TRANSFORM_MATRIX_SHIFT + max_dr - 1) - bit_depth
    lo, hi = -(1 << max_dr), (1 << max_dr) - 1
    c = coeffs.astype(jnp.int32)
    stage1 = jnp.clip(
        (jnp.einsum("ji,...jk->...ik", t, c) + (1 << (s1 - 1))) >> s1, lo, hi)
    out = jnp.clip(
        (jnp.einsum("...ij,jk->...ik", stage1, t) + (1 << (s2 - 1))) >> s2,
        -32768, 32767)
    return out.astype(jnp.int32)


# ---------------------------------------------------------------------------
# estimated residual bits (context-free CABAC cost model)
# ---------------------------------------------------------------------------

BITS_SCALE = 1.0          # residual-bits model scale (calibrated)
NXN_OVERHEAD_BITS = 4.0   # part_size flag + extra cbf/TU flags vs 2Nx2N
                          # (per-PU mode bits are counted per 4x4 candidate)
SPLIT_OVERHEAD_BITS = 3.0  # split flag + per-child mode overhead delta
# intra RQT level-1 candidates; empty by default: with the high split
# price below, the TU-split almost never wins (measured 5.07% vs 5.2%
# AI BD-rate) and its fixed-mode child evaluation costs ~30% of the
# frame-plan compute.  64x64 CUs still force-split to four TU32s.
TUSPLIT_SIZES = ()
TUSPLIT_EXTRA_BITS = 16.0  # subdiv flag + extra per-TU cbf/last overhead;
                           # deliberately high: the children are scored on
                           # original-pixel references at the TU boundary,
                           # which flatters the split (measured on-content)
# plan-stage candidate counts per TU size (HM uses 8/8/3/3 for its one
# full-RD stage, TEncSearch.cpp:2306; here the commit pass re-ranks the
# top-3 + MPMs on true references, so a smaller plan-stage k measures
# BETTER: 4.8% vs 5.2% AI BD-rate — and is faster)
NUM_RD_CANDS = {4: 4, 8: 4, 16: 3, 32: 3}


def _bits_estimate(lvl):
    """Approximate CABAC bits for (..., s, s) int32 level blocks.

    Context-free model of HM's residual syntax: per-coefficient sig /
    greater1 / greater2 / sign / Golomb-Rice escape plus last-position and
    coded-group overhead.  Constants are average fractional-bit costs of
    the corresponding bins; accurate enough to rank candidates (the real
    bits are produced by the final CABAC pass)."""
    a = jnp.abs(lvl)
    s = lvl.shape[-1]
    nz = (a > 0)
    nnz = nz.sum(axis=(-1, -2))
    # bounding box of significant coefficients ~ coded region
    ys = jnp.arange(s)
    row_any = nz.any(axis=-1)
    col_any = nz.any(axis=-2)
    last_y = jnp.max(jnp.where(row_any, ys, -1), axis=-1)
    last_x = jnp.max(jnp.where(col_any, ys, -1), axis=-1)
    bbox = (last_x + 1) * (last_y + 1)
    n_zero_coded = jnp.maximum(bbox - nnz, 0)
    # escape (remaining-level) bits: k=0 Rice baseline on level-1
    esc = jnp.maximum(a - 1, 0)
    esc_bits = jnp.where(a > 1, 2.0 * jnp.ceil(jnp.log2(esc + 1.0)) + 1.0,
                         0.0).sum(axis=(-1, -2))
    gt1 = (a > 1).sum(axis=(-1, -2))
    # last-position prefix ~ 2*log2(pos)
    lastpos_bits = jnp.where(
        nnz > 0,
        2.0 * (jnp.log2(jnp.maximum(last_x, 0) + 1.5)
               + jnp.log2(jnp.maximum(last_y, 0) + 1.5)) + 2.0, 0.0)
    n_cgs = jnp.maximum((last_x // 4 + 1) * (last_y // 4 + 1) - 1, 0)
    # weights regressed against exact CabacCounter fractional bits over
    # 519 real content TUs at QP 22..42 (R^2 = 0.99); zeros inside the
    # coded region are nearly free under the adaptive contexts, nonzero
    # coefficients dominate at ~3.8 bits apiece
    bits = (-0.089 * n_zero_coded
            + 3.798 * nnz
            - 0.648 * gt1
            + 0.616 * esc_bits
            + 2.275 * lastpos_bits
            + 1.173 * n_cgs
            - 12.817 + 1.0)              # fit constant + cbf
    return jnp.where(nnz > 0, jnp.maximum(bits, 2.0), 0.8)


# ---------------------------------------------------------------------------
# per-size candidate evaluation
# ---------------------------------------------------------------------------

def _topk_argmin(x, k):
    """Indices of the k smallest entries per row, ascending — iterative
    masked argmin (XLA's general sort is pathologically slow on CPU for
    these tiny rows; k reductions are far cheaper)."""
    cols = jnp.arange(x.shape[1])[None, :]
    idxs = []
    for _ in range(k):
        i = jnp.argmin(x, axis=1)
        idxs.append(i)
        x = jnp.where(cols == i[:, None], jnp.inf, x)
    return jnp.stack(idxs, axis=1)


@partial(jax.jit, static_argnames=("s", "bd", "k", "qp", "is_luma",
                                   "use_dst", "want_satd"))
def _size_rd(bufs, blocks, lam, s: int, bd: int, k: int,
             qp: int, is_luma: bool = True, use_dst: bool = False,
             want_satd: bool = False):
    """Best mode + RD cost for N blocks of one size (fused kernel: one
    35-mode prediction pass feeds both the SATD preselection and the
    top-k candidate RD).

    bufs: (N, 2, 4s+1) refs; blocks: (N, s, s) originals.  Candidate
    preselection by SATD (HM's Hadamard cost stage), final choice by
    dist + lam*(estimated residual bits + flat mode bits).
    Returns (best_mode (N,), cost (N,), top3 (N, 3), satd (N,35)|None)."""
    preds = analysis.predict_all_modes(bufs, s, is_luma, bd)
    diffs = preds.astype(jnp.int32) - blocks[:, None].astype(jnp.int32)
    satd = analysis.batched_satd(diffs)
    topk = _topk_argmin(satd.astype(jnp.float32), k)        # (N, k)
    cand = jnp.take_along_axis(preds, topk[:, :, None, None], axis=1)
    resi = blocks[:, None].astype(jnp.int32) - cand
    log2 = s.bit_length() - 1
    fwd = analysis.batched_fwd_transform(resi, bd, use_dst)
    lvl = analysis.batched_quant(fwd, qp, bd, log2, True)
    deq = batched_dequant(lvl, qp, bd, log2)
    rres = batched_inv_transform(deq, bd, use_dst)
    rec = jnp.clip(cand + rres, 0, (1 << bd) - 1)
    d = (blocks[:, None] - rec).astype(jnp.float32)
    dist = (d * d).sum(axis=(-1, -2))
    bits = BITS_SCALE * _bits_estimate(lvl) + 6.0           # + mode bits
    cost = dist + lam * bits
    rd_order = _topk_argmin(cost, 3)
    top3 = jnp.take_along_axis(topk, rd_order, axis=1)      # RD-ranked
    best_cost = jnp.take_along_axis(cost, rd_order[:, :1], axis=1)[:, 0]
    return (top3[:, 0], best_cost, top3, satd if want_satd else None)


def _chroma_rd5(bufs, blocks, modes5, lam, s: int, bd: int, qp: int):
    """Per-candidate (dist, bits) for 5 chroma modes per block.

    modes5: (N, 5) actual prediction modes.  One fused call evaluates all
    candidates (the predictions for all 35 modes are shared)."""
    preds = analysis.predict_all_modes(bufs, s, False, bd)
    cand = jnp.take_along_axis(preds, modes5[:, :, None, None], axis=1)
    resi = blocks[:, None].astype(jnp.int32) - cand
    log2 = s.bit_length() - 1
    fwd = analysis.batched_fwd_transform(resi, bd, False)
    lvl = analysis.batched_quant(fwd, qp, bd, log2, True)
    deq = batched_dequant(lvl, qp, bd, log2)
    rres = batched_inv_transform(deq, bd, False)
    rec = jnp.clip(cand + rres, 0, (1 << bd) - 1)
    d = (blocks[:, None] - rec).astype(jnp.float32)
    dist = (d * d).sum(axis=(-1, -2))
    bits = _bits_estimate(lvl)
    return dist, bits


@partial(jax.jit, static_argnames=("s", "bd", "qp", "is_luma", "use_dst"))
def _size_rd_fixed_mode(bufs, blocks, modes, lam, s: int, bd: int, qp: int,
                        is_luma: bool = False, use_dst: bool = False):
    """RD cost with a given mode per block (chroma DM / shared-mode TU
    split evaluation)."""
    preds = analysis.predict_all_modes(bufs, s, is_luma, bd)
    cand = jnp.take_along_axis(
        preds, modes[:, None, None, None], axis=1)[:, 0]
    resi = blocks.astype(jnp.int32) - cand
    log2 = s.bit_length() - 1
    fwd = analysis.batched_fwd_transform(resi, bd, use_dst)
    lvl = analysis.batched_quant(fwd, qp, bd, log2, True)
    deq = batched_dequant(lvl, qp, bd, log2)
    rres = batched_inv_transform(deq, bd, use_dst)
    rec = jnp.clip(cand + rres, 0, (1 << bd) - 1)
    d = (blocks - rec).astype(jnp.float32)
    dist = (d * d).sum(axis=(-1, -2))
    bits = _bits_estimate(lvl)
    return dist, bits


def _ref_buffers(plane, s, bd, strong, h, w):
    """(N, 2, 4s+1) original-pixel reference buffers for all aligned s-blocks
    fully inside (h, w); mirrors CtuSearch._premodes assembly."""
    nby, nbx = h // s, w // s
    ph, pw = plane.shape
    x0s = (np.arange(nbx) * s)[None, :].repeat(nby, 0).ravel()
    y0s = (np.arange(nby) * s)[:, None].repeat(nbx, 1).ravel()
    rng = np.arange(-1, 2 * s)
    tops = plane[np.clip(y0s - 1, 0, None)[:, None],
                 np.clip(x0s[:, None] + rng[None, :], 0, pw - 1)]
    lrng = np.concatenate([[-1], np.arange(0, 2 * s)])
    lefts = plane[np.clip(y0s[:, None] + lrng[None, :], 0, ph - 1),
                  np.clip(x0s - 1, 0, None)[:, None]]
    lefts[:, 0] = tops[:, 0]
    n = len(x0s)
    tops = tops.astype(np.int32, copy=False)
    lefts = lefts.astype(np.int32, copy=False)
    buf_u = np.zeros((n, 4 * s + 1), dtype=np.int32)
    buf_u[:, 2 * s] = tops[:, 0]
    buf_u[:, 2 * s + 1:] = tops[:, 1:]
    buf_u[:, :2 * s] = lefts[:, 1:][:, ::-1]
    buf_f = buf_u.copy()
    buf_f[:, 1:-1] = (buf_u[:, 2:] + 2 * buf_u[:, 1:-1]
                      + buf_u[:, :-2] + 2) >> 2
    if s == 32 and strong:
        log2 = 5
        thr = 1 << (bd - 5)
        c0, cs_, c2s = buf_u[:, 2 * s], buf_u[:, 3 * s], buf_u[:, 4 * s]
        l0, ls_, l2s = buf_u[:, 2 * s], buf_u[:, s], buf_u[:, 0]
        use = (np.abs(c0 + c2s - 2 * cs_) < thr) & \
              (np.abs(l0 + l2s - 2 * ls_) < thr)
        i = np.arange(1, 2 * s)
        top_bl = ((2 * s - i)[None, :] * c0[:, None]
                  + i[None, :] * c2s[:, None] + s) >> (log2 + 1)
        left_bl = ((2 * s - i)[None, :] * l0[:, None]
                   + i[None, :] * l2s[:, None] + s) >> (log2 + 1)
        sb = buf_u.copy()
        sb[:, 2 * s + 1: 4 * s] = top_bl
        sb[:, 1: 2 * s] = left_bl[:, ::-1]
        buf_f = np.where(use[:, None], sb, buf_f)
    blocks = plane[:nby * s, :nbx * s].reshape(nby, s, nbx, s) \
        .swapaxes(1, 2).reshape(n, s, s).astype(np.int32)
    return np.stack([buf_u, buf_f], axis=1), blocks, nby, nbx


class IntraPlan:
    """Dense frame plan: per-4x4-part depth / NxN flag / luma mode."""

    __slots__ = ("depth", "nxn", "mode", "h4", "w4", "cov", "tusplit",
                 "cmode", "cands")

    def __init__(self, h4, w4):
        self.h4, self.w4 = h4, w4
        self.depth = np.full((h4, w4), -1, dtype=np.int8)
        self.nxn = np.zeros((h4, w4), dtype=bool)      # at 8x8 origins
        self.mode = np.full((h4, w4), -1, dtype=np.int8)
        self.cov = np.zeros((h4, w4), dtype=bool)      # plan covers part
        self.tusplit = np.zeros((h4, w4), dtype=bool)  # at CU origins
        self.cmode = np.full((h4, w4), 4, dtype=np.int8)  # chroma cand idx
        # RD-ranked top-3 luma mode candidates at CU/PU origins, for the
        # commit pass's true-reference re-ranking
        self.cands = np.full((h4, w4, 3), -1, dtype=np.int8)


def plan_frame(orig, sps, qp, lam, chroma_weight, chroma_qps, device=None):
    """Stage 1 + 2: batched candidate RD + quadtree DP over a whole frame.

    orig: [Y, Cb, Cr] int32 planes.  Returns an IntraPlan covering every
    part whose CTU is fully inside the picture; uncovered parts fall back
    to the caller's per-CU path."""
    bd = sps.bit_depth_luma
    strong = bool(sps.strong_intra_smoothing)
    h, w = sps.pic_height, sps.pic_width
    y = orig[0]
    if device is None:
        device = _pick_device()
    lamf = float(lam)

    sizes = (4, 8, 16, 32)
    mode_s, cost_s, shape_s, mbits_s, cand_s = {}, {}, {}, {}, {}
    chroma_add = {}
    sub_bufs, sub_blocks = {}, {}
    with jax.default_device(device):
        for s in sizes:
            bufs, blocks, nby, nbx = _ref_buffers(y, s, bd, strong, h, w)
            if nby == 0 or nbx == 0:
                mode_s[s] = np.zeros((0, 0), np.int32)
                cost_s[s] = np.zeros((0, 0), np.float32)
                shape_s[s] = (0, 0)
                continue
            sub_bufs[s], sub_blocks[s] = bufs, blocks
            jb, jblk = jnp.asarray(bufs), jnp.asarray(blocks)
            k = NUM_RD_CANDS[s]
            m, c, c3, satd = _size_rd(jb, jblk, lamf, s, bd, k, int(qp),
                                      True, s == 4, s == 32)
            mode_s[s] = np.asarray(m).reshape(nby, nbx)
            cost_s[s] = np.asarray(c, dtype=np.float64).reshape(nby, nbx)
            mbits_s[s] = 6.0
            cand_s[s] = np.asarray(c3, dtype=np.int8).reshape(nby, nbx, 3)
            shape_s[s] = (nby, nbx)
            if s == 32:
                satd32 = np.asarray(satd).reshape(nby, nbx, 35)

        # shared-mode TU split (intra RQT, one level): residual of the CU
        # coded as four half-size TUs predicted per-TU but with the CU's
        # single intra mode (xRecurIntraCodingQT split branch)
        tusplit_s = {}
        for s in TUSPLIT_SIZES:
            nby, nbx = shape_s[s]
            cs = s // 2
            cby, cbx = shape_s[cs]
            if not nby or not cby:
                continue
            pm = np.repeat(np.repeat(mode_s[s], 2, 0), 2, 1)
            # children of fully-evaluated parents only (the child grid can
            # extend further into the picture than 2x the parent grid)
            rows = np.arange(2 * nby)
            cols = np.arange(2 * nbx)
            idx = (rows[:, None] * cbx + cols[None, :]).ravel()
            d, b = _size_rd_fixed_mode(
                jnp.asarray(sub_bufs[cs][idx]),
                jnp.asarray(sub_blocks[cs][idx]),
                jnp.asarray(pm.ravel().astype(np.int32)), lamf, cs, bd,
                int(qp), True, cs == 4)
            cc = (np.asarray(d, dtype=np.float64)
                  + lamf * BITS_SCALE * np.asarray(b, dtype=np.float64)
                  ).reshape(2 * nby, 2 * nbx)
            q = cc
            tusplit_s[s] = (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2]
                            + q[1::2, 1::2]) \
                + lamf * (TUSPLIT_EXTRA_BITS + mbits_s[s])
            # (subdiv flag + 3 extra luma cbf flags + the mode bits once)

        # chroma mode RD folded into each luma CU size: evaluate the five
        # HEVC chroma candidates {planar, ver, hor, dc, DM} shared between
        # Cb and Cr (estIntraPredChromaQT TEncSearch.cpp:2698)
        cmode_s = {}
        if len(orig) > 1 and sps.chroma_format_idc == 1:
            for s in (8, 16, 32):
                cs = s // 2
                nby, nbx = shape_s[s]
                if nby == 0:
                    continue
                dm = mode_s[s]
                modes5 = None
                mode_bits = [4.0, 4.0, 4.0, 4.0, 1.0]
                comp_costs = []
                for comp in (1, 2):
                    bufs, blocks, cby, cbx = _ref_buffers(
                        orig[comp], cs, sps.bit_depth_chroma, False,
                        h // 2, w // 2)
                    cby, cbx = min(cby, nby), min(cbx, nbx)
                    if cby == 0 or cbx == 0:
                        break
                    n = cby * cbx
                    luma = dm[:cby, :cbx].ravel().astype(np.int32)
                    if modes5 is None:
                        base = (0, 26, 10, 1)
                        cols = [np.where(luma == m, 34, m) for m in base]
                        cols.append(luma)                       # DM
                        modes5 = np.stack(cols, axis=1).astype(np.int32)
                    d, b = _chroma_rd5(
                        jnp.asarray(bufs[:n]), jnp.asarray(blocks[:n]),
                        jnp.asarray(modes5), lamf, cs,
                        sps.bit_depth_chroma, int(chroma_qps[comp - 1]))
                    costs = (np.asarray(d, dtype=np.float64).T * chroma_weight
                             + lamf * np.asarray(b, dtype=np.float64).T)
                    comp_costs.append(costs)
                if len(comp_costs) < 2:
                    continue
                tot = comp_costs[0] + comp_costs[1] + lamf * np.asarray(
                    mode_bits)[:, None]
                best = np.argmin(tot, axis=0)
                add = np.take_along_axis(tot, best[None], axis=0)[0]
                cost_s[s][:cby, :cbx] += add.reshape(cby, cbx)
                ca = chroma_add.setdefault(s, np.zeros_like(cost_s[s]))
                ca[:cby, :cbx] += add.reshape(cby, cbx)
                cm = np.full((nby, nbx), 4, dtype=np.int8)
                cm[:cby, :cbx] = best.reshape(cby, cbx)
                cmode_s[s] = cm

        # 64x64 intra CUs: one shared mode, TU forced-split to four TU32s
        # (the dominant smooth-area choice in HM's AI streams).  Mode from
        # the summed 35-mode SATD of the children; cost via fixed-mode
        # evaluation of the four TU32s.
        nby64, nbx64 = h // 64, w // 64
        cost64 = mode64 = None
        if nby64 and nbx64 and shape_s[32][0] >= nby64 * 2:
            ss = satd32[:nby64 * 2, :nbx64 * 2]
            quad_satd = (ss[0::2, 0::2] + ss[0::2, 1::2]
                         + ss[1::2, 0::2] + ss[1::2, 1::2])
            mode64 = np.argmin(quad_satd, axis=2).astype(np.int32)
            cby, cbx = shape_s[32]
            rows = np.arange(2 * nby64)
            cols = np.arange(2 * nbx64)
            idx = (rows[:, None] * cbx + cols[None, :]).ravel()
            pm64 = np.repeat(np.repeat(mode64, 2, 0), 2, 1)
            d, b = _size_rd_fixed_mode(
                jnp.asarray(sub_bufs[32][idx]),
                jnp.asarray(sub_blocks[32][idx]),
                jnp.asarray(pm64.ravel().astype(np.int32)), lamf, 32, bd,
                int(qp), True, False)
            cc = (np.asarray(d, dtype=np.float64)
                  + lamf * np.asarray(b, dtype=np.float64)
                  ).reshape(2 * nby64, 2 * nbx64)
            cost64 = (cc[0::2, 0::2] + cc[0::2, 1::2] + cc[1::2, 0::2]
                      + cc[1::2, 1::2]) + lamf * 8.0
            if 32 in chroma_add:
                ca = chroma_add[32][:nby64 * 2, :nbx64 * 2]
                cost64 += (ca[0::2, 0::2] + ca[0::2, 1::2]
                           + ca[1::2, 0::2] + ca[1::2, 1::2])

    # ---- stage 2: bottom-up DP ----
    split_bits = SPLIT_OVERHEAD_BITS
    tuflag = {}
    for s in (8, 16, 32):
        if s in tusplit_s and cost_s[s].size:
            ts = tusplit_s[s]
            tuflag[s] = ts < cost_s[s]
            cost_s[s] = np.minimum(cost_s[s], ts)
        else:
            tuflag[s] = np.zeros_like(cost_s[s], dtype=bool)
    # cu8: 2Nx2N vs NxN (4 PUs with own 4x4 TUs; ~3 extra mode signal bits)
    nby8, nbx8 = shape_s[8]
    c4 = cost_s[4]
    nxn = np.zeros((nby8, nbx8), dtype=bool)
    cu8 = cost_s[8].copy()
    if nby8 and c4.size:
        q = c4[:nby8 * 2, :nbx8 * 2]
        quad4 = (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2]
                 + q[1::2, 1::2])[:nby8, :nbx8] + lamf * NXN_OVERHEAD_BITS
        nxn = quad4 < cu8
        cu8 = np.minimum(cu8, quad4)
    nby16, nbx16 = shape_s[16]
    cu16 = cost_s[16].copy()
    split16 = np.zeros((nby16, nbx16), dtype=bool)
    if nby16 and cu8.size:
        q = cu8[:nby16 * 2, :nbx16 * 2]
        quad = (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2]
                + q[1::2, 1::2])[:nby16, :nbx16] + lamf * split_bits
        split16 = quad < cu16
        cu16 = np.minimum(cu16, quad)
    nby32, nbx32 = shape_s[32]
    cu32 = cost_s[32].copy()
    split32 = np.zeros((nby32, nbx32), dtype=bool)
    if nby32 and cu16.size:
        q = cu16[:nby32 * 2, :nbx32 * 2]
        quad = (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2]
                + q[1::2, 1::2])[:nby32, :nbx32] + lamf * split_bits
        split32 = quad < cu32
        cu32 = np.minimum(cu32, quad)

    # ---- emit dense plan ----
    plan = IntraPlan(h // 4, w // 4)

    def mark(by, bx, s):
        if s == 8 and nxn[by, bx]:
            py, px = by * 2, bx * 2
            plan.depth[py:py + 2, px:px + 2] = 3
            plan.nxn[py, px] = True
            plan.mode[py:py + 2, px:px + 2] = \
                mode_s[4][py:py + 2, px:px + 2]
            plan.cands[py:py + 2, px:px + 2] = \
                cand_s[4][py:py + 2, px:px + 2]
            plan.cov[py:py + 2, px:px + 2] = True
            return
        if s == 16 and split16[by, bx]:
            for sub in range(4):
                mark(by * 2 + (sub >> 1), bx * 2 + (sub & 1), 8)
            return
        if s == 32 and split32[by, bx]:
            for sub in range(4):
                mark(by * 2 + (sub >> 1), bx * 2 + (sub & 1), 16)
            return
        n = s // 4
        py, px = by * n, bx * n
        plan.depth[py:py + n, px:px + n] = 6 - s.bit_length() + 1
        plan.mode[py:py + n, px:px + n] = mode_s[s][by, bx]
        plan.cands[py, px] = cand_s[s][by, bx]
        plan.cov[py:py + n, px:px + n] = True
        if tuflag[s][by, bx]:
            plan.tusplit[py, px] = True
        if s in cmode_s:
            plan.cmode[py:py + n, px:px + n] = cmode_s[s][by, bx]

    # top level: 64x64 CU vs four 32x32 subtrees, then leftover 32s
    done64 = np.zeros((nby32, nbx32), dtype=bool)
    if cost64 is not None:
        # (cost64 carries the children's chroma costs so the comparison
        # against the four 32x32 subtrees is apples-to-apples)
        for by in range(nby64):
            for bx in range(nbx64):
                sub = cu32[by * 2:by * 2 + 2, bx * 2:bx * 2 + 2]
                if cost64[by, bx] < sub.sum() + lamf * SPLIT_OVERHEAD_BITS:
                    n = 16
                    py, px = by * n, bx * n
                    plan.depth[py:py + n, px:px + n] = 0
                    plan.mode[py:py + n, px:px + n] = mode64[by, bx]
                    plan.cov[py:py + n, px:px + n] = True
                    plan.tusplit[py, px] = True
                    done64[by * 2:by * 2 + 2, bx * 2:bx * 2 + 2] = True
    for by in range(nby32):
        for bx in range(nbx32):
            if not done64[by, bx]:
                mark(by, bx, 32)
    # 16x16 blocks inside the picture but outside the 32-aligned area
    for by in range(nby16):
        for bx in range(nbx16):
            if by * 16 + 16 <= nby32 * 32 and bx * 16 + 16 <= nbx32 * 32:
                continue
            mark(by, bx, 16)
    for by in range(nby8):
        for bx in range(nbx8):
            if by * 8 + 8 <= nby16 * 16 and bx * 8 + 8 <= nbx16 * 16:
                continue
            mark(by, bx, 8)
    return plan


def _pick_device():
    import os
    if os.environ.get("HM16_ANALYSIS_TPU"):
        return jax.devices()[0]
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return jax.devices()[0]
