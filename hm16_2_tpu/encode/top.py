"""Encoder top level (TEncTop/TEncSlice/TEncCu analogue), All-Intra first.

Round-1 search: per-CTU batched intra mode decision — for each CU, all 35
prediction modes are evaluated (SATD cost on original-minus-prediction) and
the best is committed: forward transform, quantization, bit-exact
reconstruction (shared with the decoder), then CABAC syntax emission via
CtuEncoder.  The batched candidate evaluation is the seam where the
JAX/Pallas analysis kernels plug in (hm16_2_tpu.ops.analysis).

Reference parity anchors: TEncCu.cpp:466 (xCompressCU), TEncSearch.cpp:2289
(estIntraPredQT), TEncSlice.cpp:640/910 (compress/encodeSlice),
TEncGOP.cpp:1666 (hash SEI).
"""

from __future__ import annotations

import numpy as np

from hm16_2_tpu.bitstream.bitio import BitWriter, make_nal, write_annexb
from hm16_2_tpu.bitstream.cabac import CabacEncoder, ContextSet
from hm16_2_tpu.decode.loopfilter import apply_loop_filters
from hm16_2_tpu.decode.picture import MODE_INTRA, PictureState, SIZE_2Nx2N, SIZE_NxN
from hm16_2_tpu.decode.top import picture_md5
from hm16_2_tpu.encode.ctu_enc import CtuEncoder
from hm16_2_tpu.headers import write as W
from hm16_2_tpu.headers.params import (
    I_SLICE, NAL_IDR_W_RADL, PPS, SPS, SliceHeader, VPS)
from hm16_2_tpu.ops import intra_ref, transforms_ref
from hm16_2_tpu.ops.intra_ref import DM_CHROMA_IDX
from hm16_2_tpu.ops.satd import satd_block


class EncoderConfig:
    def __init__(self, width, height, qp=32, bit_depth=8, chroma_format=1,
                 intra_period=1, deblock=True, sao=False):
        self.width, self.height = width, height
        self.qp = qp
        self.bit_depth = bit_depth
        self.chroma_format = chroma_format
        self.intra_period = intra_period
        self.deblock = deblock
        self.sao = sao
        self.log2_ctb = 6
        self.log2_min_cb = 3
        self.log2_min_tb = 2
        self.log2_max_tb = 5
        self.fixed_cu_log2 = 4       # 16x16 CUs (round-1 fixed partitioning)


def build_sps_pps(cfg: EncoderConfig):
    sps = SPS()
    sps.ptl = W.main_profile_ptl(cfg.bit_depth > 8)
    sps.pic_width, sps.pic_height = cfg.width, cfg.height
    sps.chroma_format_idc = cfg.chroma_format
    sps.bit_depth_luma = sps.bit_depth_chroma = cfg.bit_depth
    sps.log2_ctb = cfg.log2_ctb
    sps.log2_min_cb = cfg.log2_min_cb
    sps.log2_min_tb = cfg.log2_min_tb
    sps.log2_max_tb = cfg.log2_max_tb
    sps.max_tr_hierarchy_depth_inter = 3
    sps.max_tr_hierarchy_depth_intra = 3
    sps.amp_enabled = 1
    sps.sao_enabled = 1 if cfg.sao else 0
    sps.temporal_mvp_enabled = 0
    sps.strong_intra_smoothing = 1
    sps.max_dec_pic_buffering = [5]
    sps.num_reorder_pics = [0]
    sps.max_latency_increase = [0]
    sps.rps_list = []

    pps = PPS()
    pps.init_qp = 26
    pps.sign_data_hiding = 0
    pps.loop_filter_across_slices = 1
    if not cfg.deblock:
        pps.deblocking_filter_control_present = 1
        pps.deblocking_filter_disabled = 1
    return sps, pps


class Encoder:
    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        self.sps, self.pps = build_sps_pps(cfg)
        self.vps = VPS(ptl=self.sps.ptl)
        self.frames_coded = 0
        self.bits_per_frame = []

    def encode_frame(self, planes: list[np.ndarray], poc: int) -> bytes:
        """Encode one frame (AI: always IDR), return the access unit bytes."""
        cfg, sps, pps = self.cfg, self.sps, self.pps
        sh = SliceHeader()
        sh.nal_type = NAL_IDR_W_RADL
        sh.slice_type = I_SLICE
        sh.poc = poc
        sh.qp = cfg.qp
        sh.sps, sh.pps = sps, pps
        sh.deblocking_filter_disabled = pps.deblocking_filter_disabled

        pic = PictureState(sps, pps)
        pic.poc = poc
        pic.slices.append(sh)

        search = CtuSearch(pic, sh, planes)
        enc = CtuEncoder(pic, sh, 0)
        bw = BitWriter()
        W.write_slice_header(bw, sh, sps, pps)
        ctx = ContextSet()
        cab = CabacEncoder(bw, ctx)
        enc.attach(cab)
        # slice contexts init (TEncSbac resetEntropy semantics)
        ctx.reset(I_SLICE, sh.qp)

        n_ctus = pic.w_ctbs * pic.h_ctbs
        for ts in range(n_ctus):
            rs = int(pic.tiles.ctu_ts_to_rs[ts])
            cx, cy = rs % pic.w_ctbs, rs // pic.w_ctbs
            search.decide_ctu(cx, cy)
            enc.encode_ctu(cx, cy, last_in_slice=(ts == n_ctus - 1))
        cab.finish()
        bw.u(1, 1)              # stop bit after final terminate
        bw.align_zero()
        slice_nal = make_nal(sh.nal_type, bw.get_bytes())

        # in-loop filters on recon (must mirror the decoder exactly)
        apply_loop_filters(pic)

        bds = [sps.bit_depth_luma] + [sps.bit_depth_chroma] * (pic.num_comps - 1)
        recon = [pic.crop_output(c) for c in range(pic.num_comps)]
        digests = picture_md5(recon, bds)
        sei_nal = W.write_hash_sei(digests)

        nals = []
        if self.frames_coded == 0:
            nals += [W.write_vps(self.vps), W.write_sps(sps), W.write_pps(pps)]
        nals += [slice_nal, sei_nal]
        self.frames_coded += 1
        self.last_recon = recon
        au = write_annexb(nals)
        self.bits_per_frame.append(len(au) * 8)
        return au


class CtuSearch:
    """Per-CTU mode decision + reconstruction (fills picture arrays)."""

    def __init__(self, pic: PictureState, sh: SliceHeader, orig_planes):
        self.pic = pic
        self.sh = sh
        self.sps, self.pps = sh.sps, sh.pps
        self.orig = orig_planes
        self.cu_log2 = 4
        self.bit_depth = [self.sps.bit_depth_luma, self.sps.bit_depth_chroma,
                          self.sps.bit_depth_chroma]

    def decide_ctu(self, cx, cy):
        pic = self.pic
        parts = pic.ctb // 4
        self._decide_rec(cx * parts, cy * parts, pic.log2_ctb)

    def _decide_rec(self, px, py, log2):
        pic = self.pic
        if px * 4 >= pic.w or py * 4 >= pic.h:
            return
        inside = (px * 4 + (1 << log2) <= pic.w) and \
                 (py * 4 + (1 << log2) <= pic.h)
        if log2 > self.cu_log2 or not inside:
            assert log2 > self.sps.log2_min_cb or inside, \
                "picture dims must be multiples of the minimum CU size"
            half = 1 << (log2 - 3)
            for sub in range(4):
                self._decide_rec(px + (sub & 1) * half,
                                 py + (sub >> 1) * half, log2 - 1)
            return
        self._encode_cu(px, py, log2)

    # ------------------------------------------------------------------

    def _encode_cu(self, px, py, log2):
        pic, sps = self.pic, self.sps
        size = 1 << log2
        x0, y0 = px * 4, py * 4
        depth = pic.log2_ctb - log2
        n = size // 4

        # commit CU-level part fields
        pic.depth[py:py + n, px:px + n] = depth
        pic.pred_mode[py:py + n, px:px + n] = MODE_INTRA
        pic.part_size[py:py + n, px:px + n] = SIZE_2Nx2N
        pic.qp[py:py + n, px:px + n] = self.sh.qp
        pic.slice_id[py:py + n, px:px + n] = 0
        pic.coded[py:py + n, px:px + n] = True
        pic.tr_idx[py:py + n, px:px + n] = 0

        best_mode = self._search_luma_mode(px, py, log2)
        pic.intra_luma[py:py + n, px:px + n] = best_mode
        pic.intra_chroma[py:py + n, px:px + n] = DM_CHROMA_IDX

        # transform + quant + recon per component (TU == CU)
        cbf_y = self._code_tu(px, py, log2, 0, best_mode)
        pic.cbf[0][py:py + n, px:px + n] = cbf_y          # tr_depth 0 bit
        if pic.num_comps > 1:
            chroma_mode = best_mode                        # DM
            cbf_cb = self._code_tu(px, py, log2, 1, chroma_mode)
            cbf_cr = self._code_tu(px, py, log2, 2, chroma_mode)
            pic.cbf[1][py:py + n, px:px + n] = cbf_cb
            pic.cbf[2][py:py + n, px:px + n] = cbf_cr

    def _refs_for(self, px, py, log2, comp):
        pic, sps = self.pic, self.sps
        sx, sy = pic.comp_shift[comp]
        size = (1 << log2) >> (sx if comp else 0)
        x0 = (px * 4) >> (sx if comp else 0)
        y0 = (py * 4) >> (sy if comp else 0)
        unit_w = 4 >> (sx if comp else 0)
        unit_h = 4 >> (sy if comp else 0)
        constrained = bool(self.pps.constrained_intra_pred)

        blk_parts = max((1 << log2) >> 2, 1)

        def avail(ax, ay):
            if ax < 0 or ay < 0:
                return False
            lx, ly = ax << (sx if comp else 0), ay << (sy if comp else 0)
            return pic.part_available(lx // 4, ly // 4, px, py, constrained,
                                      blk_parts, blk_parts)

        return intra_ref.fill_reference_samples(
            pic.rec[comp], x0, y0, size, unit_w, unit_h, avail,
            self.bit_depth[comp])

    def _predict(self, px, py, log2, comp, mode):
        pic, sps = self.pic, self.sps
        sx, _ = pic.comp_shift[comp]
        size = (1 << log2) >> (sx if comp else 0)
        top, left = self._refs_for(px, py, log2, comp)
        if intra_ref.should_filter(mode, size, comp == 0, sps.chroma_format_idc,
                                   bool(sps.intra_smoothing_disabled)):
            top, left = intra_ref.filter_reference_samples(
                top, left, size, self.bit_depth[comp],
                bool(sps.strong_intra_smoothing))
        return intra_ref.predict_intra(mode, top, left, size,
                                       self.bit_depth[comp], comp == 0)

    def _search_luma_mode(self, px, py, log2) -> int:
        """35-mode SATD sweep via the batched gather-table kernel
        (estIntraPredQT analogue)."""
        from hm16_2_tpu.ops import analysis
        pic = self.pic
        size = 1 << log2
        x0, y0 = px * 4, py * 4
        orig = self.orig[0][y0:y0 + size, x0:x0 + size].astype(np.int64)
        top, left = self._refs_for(px, py, log2, 0)
        top_f, left_f = intra_ref.filter_reference_samples(
            top, left, size, self.bit_depth[0],
            bool(self.sps.strong_intra_smoothing))
        buf_u = np.concatenate([left[1:][::-1], top]).astype(np.int64)
        buf_f = np.concatenate([left_f[1:][::-1], top_f]).astype(np.int64)
        preds = analysis.predict_all_modes_np(buf_u, buf_f, size, True,
                                              self.bit_depth[0])
        costs = analysis.satd_all_np(orig[None] - preds)
        return int(np.argmin(costs))

    def _code_tu(self, px, py, log2, comp, mode) -> int:
        """Forward transform + quant + reconstruct one TU; returns cbf."""
        pic, sps = self.pic, self.sps
        sx, sy = pic.comp_shift[comp]
        size = (1 << log2) >> (sx if comp else 0)
        x0 = (px * 4) >> (sx if comp else 0)
        y0 = (py * 4) >> (sy if comp else 0)
        bd = self.bit_depth[comp]
        orig = self.orig[comp][y0:y0 + size, x0:x0 + size].astype(np.int64)
        pred = self._predict(px, py, log2, comp, mode)
        resi = orig - pred
        log2_tr = size.bit_length() - 1
        use_dst = (comp == 0 and size == 4)
        fwd = transforms_ref.forward_transform(resi, bd, use_dst)
        qp = self._tu_qp(px, py, comp)
        levels = transforms_ref.quant(fwd, qp, bd, log2_tr, is_intra=True)
        cbf = 1 if np.any(levels) else 0
        pic.coeff[comp][y0:y0 + size, x0:x0 + size] = levels
        if cbf:
            deq = transforms_ref.dequant(levels, qp, bd, log2_tr)
            rec_resi = transforms_ref.inverse_transform(deq, bd, use_dst)
        else:
            rec_resi = 0
        pic.rec[comp][y0:y0 + size, x0:x0 + size] = np.clip(
            pred + rec_resi, 0, (1 << bd) - 1)
        return cbf

    def _tu_qp(self, px, py, comp):
        sps, pps, sh = self.sps, self.pps, self.sh
        qpy = int(self.pic.qp[py, px])
        if comp == 0:
            return qpy + 6 * (sps.bit_depth_luma - 8)
        bd_offset = 6 * (sps.bit_depth_chroma - 8)
        off = (pps.cb_qp_offset + sh.cb_qp_offset) if comp == 1 else \
            (pps.cr_qp_offset + sh.cr_qp_offset)
        base = int(np.clip(qpy + off, -bd_offset, 57))
        if base < 0:
            return base + bd_offset
        from hm16_2_tpu.common.tables import CHROMA_QP_SCALE
        return int(CHROMA_QP_SCALE[sps.chroma_format_idc][base]) + bd_offset
