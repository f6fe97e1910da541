"""Regenerate /tmp/hevc_data test fixtures from scratch (rng seed 42).

Synthetic-but-videolike planar YUV content plus every golden bitstream the
test-suite consumes, produced by the reference HM binaries at /tmp/hmref/bin
(see .claude/skills/verify/SKILL.md for how to build them).

Usage:  python tests/make_fixtures.py [--data-dir /tmp/hevc_data]

The goldens and their recon files are regenerated *together*, so the decode
tests stay self-consistent for any content; the content generator below is
nevertheless deterministic (numpy default_rng(42)) so two machines produce
byte-identical fixtures.

Reference commands mirror the JCT-VC common-test-condition cfg files
(/tmp/hmref/cfg/encoder_*.cfg); probe streams exercise RExt chroma formats,
PCM, scaling lists, dQP, multi-slice, weighted prediction, lossless
(TransquantBypass), and CRC/checksum picture hashes.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

HM_ENC = "/tmp/hmref/bin/TAppEncoderStatic"
CFG = "/tmp/hmref/cfg"


def make_yuv(w, h, frames, *, seed=42, chroma=420, bits=8):
    """Video-like content: moving textured plates over a smooth gradient,
    global pan, mild sensor noise.  Deterministic for a given seed."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 60 + 60 * np.sin(xx / w * 3.1) * np.cos(yy / h * 2.3)
    n_plates = 6
    px = rng.uniform(0, w, n_plates)
    py = rng.uniform(0, h, n_plates)
    vx = rng.uniform(-3, 3, n_plates)
    vy = rng.uniform(-2, 2, n_plates)
    pw = rng.uniform(w / 8, w / 3, n_plates)
    ph = rng.uniform(h / 8, h / 3, n_plates)
    freq = rng.uniform(0.2, 1.4, (n_plates, 2))
    amp = rng.uniform(30, 90, n_plates)
    cb_off = rng.uniform(-40, 40, n_plates)
    cr_off = rng.uniform(-40, 40, n_plates)
    out = []
    mx = (1 << bits) - 1
    sc = (1 << bits) / 256.0
    for f in range(frames):
        gx, gy = 0.8 * f, 0.3 * f                 # global pan
        y = base + 10 * np.sin((xx + gx) / 7.0) * np.sin((yy + gy) / 9.0)
        cb = np.full((h, w), 128.0)
        cr = np.full((h, w), 128.0)
        for i in range(n_plates):
            cx = (px[i] + vx[i] * f) % (w + pw[i]) - pw[i] / 2
            cy = (py[i] + vy[i] * f) % (h + ph[i]) - ph[i] / 2
            m = (np.abs(xx - cx) < pw[i] / 2) & (np.abs(yy - cy) < ph[i] / 2)
            tex = amp[i] * np.sin((xx - cx) * freq[i, 0]) \
                * np.cos((yy - cy) * freq[i, 1])
            y = np.where(m, 110 + tex, y)
            cb = np.where(m, 128 + cb_off[i], cb)
            cr = np.where(m, 128 + cr_off[i], cr)
        y = y + rng.normal(0, 1.2, (h, w))
        planes = [y, cb, cr]
        if chroma == 420:
            planes = [y] + [p.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
                            for p in planes[1:]]
        elif chroma == 422:
            planes = [y] + [p.reshape(h, w // 2, 2).mean(2)
                            for p in planes[1:]]
        elif chroma == 400:
            planes = [y]
        dt = np.uint8 if bits == 8 else np.uint16
        out.append([np.clip(p * sc, 0, mx).round().astype(dt)
                    for p in planes])
    return out


def write_yuv(path, frames):
    with open(path, "wb") as f:
        for planes in frames:
            for p in planes:
                f.write(p.tobytes())


def hm(args, check=True):
    cmd = [HM_ENC] + [str(a) for a in args]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if check and r.returncode != 0:
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("HM encoder failed: " + " ".join(cmd))
    return r


def enc(cfg, src, w, h, frames, out, rec, q=32, extra=()):
    hm(["-c", f"{CFG}/{cfg}", "-i", src, "-wdt", w, "-hgt", h,
        "-fr", 30, "-f", frames, "-b", out, "-o", rec,
        "--SEIDecodedPictureHash=1", "-q", q, *extra])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/hevc_data")
    a = ap.parse_args()
    d = a.data_dir
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(HM_ENC):
        sys.exit("reference encoder missing; build per .claude/skills/verify")

    j = lambda n: os.path.join(d, n)

    # ---- source content (seed 42) ----
    write_yuv(j("tiny64.yuv"), make_yuv(64, 64, 10))
    write_yuv(j("bq416.yuv"), make_yuv(416, 240, 16))
    write_yuv(j("w512.yuv"), make_yuv(512, 128, 3))
    write_yuv(j("noise64.yuv"), make_yuv(64, 64, 2, seed=7))
    write_yuv(j("n444.yuv"), make_yuv(64, 64, 2, chroma=444))
    n422 = j("n422.yuv")
    write_yuv(n422, make_yuv(64, 64, 2, chroma=422))
    write_yuv(j("n422_8.yuv"), make_yuv(64, 64, 8, chroma=422))
    write_yuv(j("n444_8.yuv"), make_yuv(64, 64, 8, chroma=444))

    ai, ldp, ra = ("encoder_intra_main.cfg", "encoder_lowdelay_P_main.cfg",
                   "encoder_randomaccess_main.cfg")
    nolf = ["--LoopFilterDisable=1", "--SAO=0"]

    # ---- golden streams (decode tests) ----
    enc(ai, j("tiny64.yuv"), 64, 64, 2, j("tiny64_ai.bin"),
        j("tiny64_ai_rec.yuv"))
    enc(ai, j("tiny64.yuv"), 64, 64, 2, j("tiny64_ai_nolf.bin"),
        j("tiny64_ai_nolf_rec.yuv"), extra=nolf)
    enc(ai, j("bq416.yuv"), 416, 240, 4, j("bq_ai_nolf.bin"),
        j("bq_ai_nolf_rec.yuv"), extra=nolf)
    enc(ai, j("bq416.yuv"), 416, 240, 4, j("bq_ai_q22.bin"),
        j("bq_ai_q22_rec.yuv"), q=22)
    enc(ai, j("bq416.yuv"), 416, 240, 4, j("bq_ai_q37.bin"),
        j("bq_ai_q37_rec.yuv"), q=37)
    enc(ldp, j("tiny64.yuv"), 64, 64, 8, j("tiny64_ldp.bin"),
        j("tiny64_ldp_rec.yuv"))
    enc(ldp, j("bq416.yuv"), 416, 240, 8, j("bq_ldp.bin"),
        j("bq_ldp_rec.yuv"))
    enc(ra, j("tiny64.yuv"), 64, 64, 8, j("tiny64_ra.bin"),
        j("tiny64_ra_rec.yuv"))
    enc(ra, j("bq416.yuv"), 416, 240, 8, j("bq_ra.bin"),
        j("bq_ra_rec.yuv"))
    enc("encoder_randomaccess_main10.cfg", j("tiny64.yuv"), 64, 64, 8,
        j("tiny64_ra10.bin"), j("tiny64_ra10_rec.yuv"),
        extra=["--InputBitDepth=8"])
    enc(ai, j("w512.yuv"), 512, 128, 3, j("w512_wpp.bin"),
        j("w512_wpp_rec.yuv"), extra=["--WaveFrontSynchro=1"])
    enc(ai, j("w512.yuv"), 512, 128, 3, j("w512_tile.bin"),
        j("w512_tile_rec.yuv"),
        extra=["--TileUniformSpacing=1", "--NumTileColumnsMinus1=1",
               "--NumTileRowsMinus1=1"])

    # ---- probe streams (feature corners) ----
    enc("encoder_intra_main_rext.cfg", n422, 64, 64, 2, j("t_422.bin"),
        j("t_422_rec.yuv"), extra=["--InputChromaFormat=422"])
    enc("encoder_intra_main_rext.cfg", j("n444.yuv"), 64, 64, 2,
        j("t_444.bin"), j("t_444_rec.yuv"),
        extra=["--InputChromaFormat=444"])
    enc("encoder_lowdelay_main_rext.cfg", j("n422_8.yuv"), 64, 64, 8,
        j("t_422_ld.bin"), j("t_422_ld_rec.yuv"),
        extra=["--InputChromaFormat=422"])
    enc("encoder_lowdelay_main_rext.cfg", j("n444_8.yuv"), 64, 64, 8,
        j("t_444_ld.bin"), j("t_444_ld_rec.yuv"),
        extra=["--InputChromaFormat=444"])
    enc(ai, j("noise64.yuv"), 64, 64, 2, j("t_pcm.bin"), j("t_pcm_rec.yuv"),
        q=2, extra=["--PCMEnabledFlag=1", "--PCMLog2MinSize=3",
                    "--PCMLog2MaxSize=5"])
    enc(ai, j("noise64.yuv"), 64, 64, 2, j("t_pcm2.bin"), j("t_pcm2_rec.yuv"),
        q=2, extra=["--PCMEnabledFlag=1", "--PCMLog2MinSize=3",
                    "--PCMLog2MaxSize=5", "--PCMInputBitDepthFlag=1"])
    enc(ai, j("noise64.yuv"), 64, 64, 2, j("t_pcm3.bin"), j("t_pcm3_rec.yuv"),
        q=12, extra=["--PCMEnabledFlag=1", "--PCMLog2MinSize=3",
                     "--PCMLog2MaxSize=5", "--PCMFilterDisableFlag=1"])
    enc(ai, j("tiny64.yuv"), 64, 64, 2, j("t_crc.bin"), j("t_crc_rec.yuv"),
        extra=["--SEIDecodedPictureHash=2"])
    enc(ai, j("tiny64.yuv"), 64, 64, 2, j("t_cksum.bin"),
        j("t_cksum_rec.yuv"), extra=["--SEIDecodedPictureHash=3"])
    enc(ai, j("tiny64.yuv"), 64, 64, 2, j("t_sl.bin"), j("t_sl_rec.yuv"),
        extra=["--ScalingList=1"])
    enc(ai, j("bq416.yuv"), 416, 240, 2, j("t_dqp.bin"), j("t_dqp_rec.yuv"),
        extra=["--MaxCuDQPDepth=1", "--DeltaQpRD=1"])
    enc(ai, j("bq416.yuv"), 416, 240, 2, j("t_ms.bin"), j("t_ms_rec.yuv"),
        extra=["--SliceMode=1", "--SliceArgument=30"])
    enc(ldp, j("bq416.yuv"), 416, 240, 4, j("t_wp.bin"), j("t_wp_rec.yuv"),
        extra=["--WeightedPredP=1"])
    enc(ai, j("tiny64.yuv"), 64, 64, 2, j("t_tqb.bin"), j("t_tqb_rec.yuv"),
        extra=["--TransquantBypassEnableFlag=1", "--CUTransquantBypassFlagForce=1"])
    print("fixtures written to", d)


if __name__ == "__main__":
    main()
