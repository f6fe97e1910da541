"""SAO parameter estimation (TEncSampleAdaptiveOffset analogue).

Per-CTU, per-component statistics on (original - deblocked reconstruction)
for every candidate type (EO classes 0-3 via the shared edge classifier,
BO over 32 bands), then an RD decision across OFF / NEW / MERGE-left /
MERGE-up using the closed-form distortion delta of adding offset o to a
category with pixel count N and diff sum S:  dD = N*o^2 - 2*o*S
(getBlkStats TEncSampleAdaptiveOffset.cpp:910, deriveModeNewRDO :583,
deriveModeMergeRDO :726).
"""

from __future__ import annotations

import numpy as np

from hm16_2_tpu.ops.sao_ref import _ctu_avail, _eo_classify

# edge_type value -> offsets4 slot (value 2 is category 0: no offset)
_EDGE_TO_SLOT = {0: 0, 1: 1, 3: 2, 4: 3}


def _best_offsets_vec(S, N, lo, hi, lam):
    """Vectorized _best_offset over category arrays: evaluates every
    offset between 0 and the rounded estimate (inclusive) and keeps the
    cheapest — identical to the scalar search path."""
    S = np.asarray(S, dtype=np.float64)
    N = np.asarray(N, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        est = np.where(N > 0, np.round(S / np.maximum(N, 1)), 0.0)
    est = np.clip(est, lo, hi).astype(np.int64)
    max_abs = max(abs(lo), abs(hi))
    os_ = np.arange(-max_abs, max_abs + 1)                 # (M,)
    cost = (N[..., None] * os_ * os_ - 2.0 * os_ * S[..., None]
            + lam * (np.abs(os_) + 2))
    cost = np.where(os_ == 0, 0.0, cost)                   # o=0 costs 0
    # valid offsets lie between 0 and est (inclusive), same sign as est
    valid = ((os_ >= np.minimum(est, 0)[..., None])
             & (os_ <= np.maximum(est, 0)[..., None]))
    cost = np.where(valid, cost, np.inf)
    k = np.argmin(cost, axis=-1)
    best_o = os_[k]
    best_c = np.take_along_axis(cost, k[..., None], axis=-1)[..., 0]
    best_c = np.where(np.isfinite(best_c), best_c, 0.0)
    return best_o, best_c


def _best_offset(s, n, lo, hi, lam):
    """Offset minimizing N*o^2 - 2*o*S + lam*rate(|o|), searched from the
    rounded estimate toward zero (xGetBestOffset-style)."""
    if n == 0:
        return 0, 0.0
    est = int(np.clip(round(s / n), lo, hi))
    best_o, best_c = 0, 0.0
    o = est
    while True:
        cost = n * o * o - 2.0 * o * s + lam * (abs(o) + 2)
        if cost < best_c:
            best_o, best_c = o, cost
        if o == 0:
            break
        o += 1 if o < 0 else -1
    return best_o, best_c


def _collect_stats(pic, orig, src, cx, cy, comp, avail):
    """Per-type stats for one CTU comp: dict type -> (S[..], N[..])."""
    sx, sy = pic.comp_shift[comp]
    x0 = (cx * pic.ctb) >> sx
    y0 = (cy * pic.ctb) >> sy
    w = min(pic.ctb >> sx, (pic.w >> sx) - x0)
    h = min(pic.ctb >> sy, (pic.h >> sy) - y0)
    if w <= 0 or h <= 0:
        return None
    o_blk = orig[comp][y0:y0 + h, x0:x0 + w].astype(np.int64)
    stats = {}
    for t in range(4):                      # EO classes
        ty0, tx0, th, tw, proc, edge_type, cur = _eo_classify(
            pic, src[comp], cx, cy, comp, t, avail)
        diff = o_blk - cur
        S = np.zeros(4)
        N = np.zeros(4, dtype=np.int64)
        for et, slot in _EDGE_TO_SLOT.items():
            m = proc & (edge_type == et)
            S[slot] = float(diff[m].sum())
            N[slot] = int(m.sum())
        stats[t] = (S, N)
    # BO: 32 bands
    bd = pic.sps.bit_depth_luma if comp == 0 else pic.sps.bit_depth_chroma
    rec_blk = src[comp][y0:y0 + h, x0:x0 + w].astype(np.int64)
    bands = rec_blk >> (bd - 5)
    diff = o_blk - rec_blk
    S = np.zeros(32)
    N = np.zeros(32, dtype=np.int64)
    np.add.at(S, bands.ravel(), diff.ravel().astype(np.float64))
    np.add.at(N, bands.ravel(), 1)
    stats[4] = (S, N)
    return stats


def _delta_for_params(stats, type_idx, offs4, band):
    """Distortion delta of applying the given (already signed) offsets."""
    S, N = stats[4] if type_idx == 4 else stats[type_idx]
    d = 0.0
    for i in range(4):
        o = int(offs4[i])
        idx = (band + i) % 32 if type_idx == 4 else i
        d += N[idx] * o * o - 2.0 * o * S[idx]
    return d


def estimate_sao(pic, orig, lam):
    """Fill pic.sao_mode/type/offsets/band (+ pic.sao_merge) for all CTUs."""
    src = [p.copy() for p in pic.rec]        # deblocked, pre-SAO
    n_ctu = pic.w_ctbs * pic.h_ctbs
    pic.sao_merge = np.zeros(n_ctu, dtype=np.int8)
    bd_max = [(1 << (min((pic.sps.bit_depth_luma if c == 0 else
                          pic.sps.bit_depth_chroma), 10) - 5)) - 1
              for c in range(3)]

    for cy in range(pic.h_ctbs):
        for cx in range(pic.w_ctbs):
            rs = cy * pic.w_ctbs + cx
            avail = {(dy, dx): _ctu_avail(pic, cx, cy, dx, dy)
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1)}
            stats = [_collect_stats(pic, orig, src, cx, cy, c, avail)
                     for c in range(pic.num_comps)]

            # ---- NEW mode decision ----
            # luma: best of OFF / EO0-3 / BO
            choices = []       # per channel: (cost, mode, type, offs, band)
            for chan, comps in ((0, [0]), (1, [1, 2])):
                if comps[0] >= pic.num_comps or stats[comps[0]] is None:
                    break
                best = (lam * 1.0, 0, 0, {c: [0, 0, 0, 0] for c in comps},
                        {c: 0 for c in comps})
                for t in range(5):
                    cost = lam * 4.0     # type/class signalling ballpark
                    offs = {}
                    bands = {}
                    ok = True
                    for c in comps:
                        st = stats[c]
                        if st is None:
                            ok = False
                            break
                        mx = bd_max[c]
                        if t == 4:
                            S, N = st[4]
                            ob, cb = _best_offsets_vec(S, N, -mx, mx, lam)
                            win = cb + np.roll(cb, -1) + np.roll(cb, -2) \
                                + np.roll(cb, -3)
                            best_band = int(np.argmin(win))
                            cost += float(win[best_band]) + lam * 5
                            offs[c] = [int(ob[(best_band + i) % 32])
                                       for i in range(4)]
                            bands[c] = best_band
                        else:
                            S, N = st[t]
                            o_pos, c_pos = _best_offsets_vec(
                                S[:2], N[:2], 0, mx, lam)
                            o_neg, c_neg = _best_offsets_vec(
                                S[2:], N[2:], -mx, 0, lam)
                            cost += float(c_pos.sum() + c_neg.sum())
                            offs[c] = [int(o_pos[0]), int(o_pos[1]),
                                       int(o_neg[0]), int(o_neg[1])]
                            bands[c] = 0
                    if ok and cost < best[0]:
                        best = (cost, 1, t, offs, bands)
                choices.append(best)

            new_cost = sum(c[0] for c in choices)

            # ---- MERGE candidates ----
            def merge_cost(src_rs):
                tot = 0.0
                for c in range(pic.num_comps):
                    if stats[c] is None:
                        continue
                    if pic.sao_mode[src_rs, c] == 0:
                        continue
                    tot += _delta_for_params(
                        stats[c], int(pic.sao_type[src_rs, c]),
                        pic.sao_offsets[src_rs, c],
                        int(pic.sao_band[src_rs, c]))
                return tot + lam * 1.0

            # merge is SYNTAX prediction: allowed only within the same
            # slice AND tile (unlike the loop-filter availability above,
            # which the across-slices/tiles flags can widen)
            def syn_avail(dx, dy):
                nx, ny = cx + dx, cy + dy
                if nx < 0 or ny < 0:
                    return False
                parts = pic.ctb // 4
                if pic.slice_id[cy * parts, cx * parts] != \
                        pic.slice_id[ny * parts, nx * parts]:
                    return False
                return pic.tiles.tile_of_ctu[cy, cx] == \
                    pic.tiles.tile_of_ctu[ny, nx]

            best_merge, best_merge_cost = 0, None
            if syn_avail(-1, 0):
                cml = merge_cost(rs - 1)
                if best_merge_cost is None or cml < best_merge_cost:
                    best_merge, best_merge_cost = 1, cml
            if syn_avail(0, -1):
                cmu = merge_cost(rs - pic.w_ctbs)
                if best_merge_cost is None or cmu < best_merge_cost:
                    best_merge, best_merge_cost = 2, cmu

            if best_merge_cost is not None and best_merge_cost < new_cost:
                src_rs = rs - 1 if best_merge == 1 else rs - pic.w_ctbs
                pic.sao_merge[rs] = best_merge
                for c in range(pic.num_comps):
                    pic.sao_mode[rs, c] = pic.sao_mode[src_rs, c]
                    pic.sao_type[rs, c] = pic.sao_type[src_rs, c]
                    pic.sao_offsets[rs, c] = pic.sao_offsets[src_rs, c]
                    pic.sao_band[rs, c] = pic.sao_band[src_rs, c]
                continue

            for chan, (cost, mode, t, offs, bands) in enumerate(choices):
                comps = [0] if chan == 0 else [1, 2]
                for c in comps:
                    if c >= pic.num_comps:
                        continue
                    pic.sao_mode[rs, c] = mode
                    pic.sao_type[rs, c] = t
                    if mode:
                        pic.sao_offsets[rs, c] = offs[c]
                        pic.sao_band[rs, c] = bands[c]
