"""Benchmark entry point (driver-run, one JSON line on stdout).

Headline: end-to-end All-Intra encode frames/s at 416x240 QP32, measured
on deterministic video-like content (tests/make_fixtures.make_yuv, seed
42) and compared against the HM reference encoder run on the SAME
content: measured live when /tmp/hmref/bin is present, otherwise the
stored constant below (8 frames / 2.896 s single-thread on this box).

Extra keys in the JSON: ai_bdrate_pct (BD-rate vs HM at QP 27/32/37 on
the same content, only when the HM binary is available).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

HM_ENC = "/tmp/hmref/bin/TAppEncoderStatic"
HM_AI_416_FPS_STORED = 8 / 2.896   # same content, encoder_intra_main.cfg, QP32


def bench_content(frames=9):
    from make_fixtures import make_yuv
    out = []
    for planes in make_yuv(416, 240, frames, seed=42):
        out.append([p.astype(np.int32) for p in planes])
    return out


def bench_end_to_end(planes):
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    enc = Encoder(EncoderConfig(416, 240, qp=32))
    enc.encode_frame([p.copy() for p in planes[0]], 1000)  # jit warmup
    t0 = time.time()
    for t, p in enumerate(planes):
        enc.encode_frame([q.copy() for q in p], t)
    return len(planes) / (time.time() - t0)


def measure_hm_fps(n=8):
    if not os.path.exists(HM_ENC):
        return None
    src = "/tmp/bench416.yuv"
    if not os.path.exists(src):
        from make_fixtures import make_yuv, write_yuv
        write_yuv(src, make_yuv(416, 240, 9, seed=42))
    t0 = time.time()
    r = subprocess.run(
        [HM_ENC, "-c", "/tmp/hmref/cfg/encoder_intra_main.cfg", "-i", src,
         "-wdt", "416", "-hgt", "240", "-fr", "30", "-f", str(n),
         "-b", "/tmp/bench_hm.bin", "-o", "/dev/null", "-q", "32",
         "--SEIDecodedPictureHash=1"], capture_output=True)
    if r.returncode != 0:
        return None
    return n / (time.time() - t0)


def measure_bdrate(mode="ai", frames=2, qps=(27, 32, 37)):
    """BD-rate vs HM on the same content (negative = we beat HM)."""
    if not os.path.exists(HM_ENC):
        return None
    try:
        src = "/tmp/bench416.yuv"
        if not os.path.exists(src):
            from make_fixtures import make_yuv, write_yuv
            write_yuv(src, make_yuv(416, 240, 9, seed=42))
        from hm16_2_tpu.tools import bdrate as bdr
        bd, _ = bdr.run(src, 416, 240, frames, mode, list(qps),
                        verbose=False)
        return round(bd, 2)
    except Exception as e:
        print(f"bdrate {mode} skipped: {e}", file=sys.stderr)
        return None


def main():
    planes = bench_content()
    fps = bench_end_to_end(planes)
    hm_fps = measure_hm_fps()
    baseline = hm_fps if hm_fps else HM_AI_416_FPS_STORED
    out = {
        "metric": "AI encode fps (416x240, QP32, end-to-end)",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 4),
        "hm_fps_same_content": round(baseline, 4),
        "hm_measured_live": bool(hm_fps),
    }
    bd = measure_bdrate("ai", 2, (27, 32, 37))
    if bd is not None:
        out["ai_bdrate_pct_vs_hm"] = bd
    bd = measure_bdrate("ldp", 4, (32, 37))
    if bd is not None:
        out["ldp_bdrate_pct_vs_hm"] = bd
    bd = measure_bdrate("ra", 9, (32, 37))
    if bd is not None:
        out["ra_bdrate_pct_vs_hm"] = bd
    print(json.dumps(out))


if __name__ == "__main__":
    main()
