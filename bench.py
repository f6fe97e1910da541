"""Benchmark entry point (driver-run, one JSON line on stdout).

Headline: end-to-end All-Intra encode frames/s at 416x240 QP32 on the
default accelerator (pipelined encode_stream: the chip computes frame
N+1's plan while the host commits frame N), compared against the HM
reference encoder run single-threaded on the SAME content (measured live
when /tmp/hmref/bin is present, else the stored constant).

Every measurement phase runs in its OWN subprocess with retries: the
axon TPU tunnel intermittently kills the worker (especially during large
fresh compiles), and a dead worker poisons the whole jax client in that
process.  Subprocess isolation + the persistent XLA compile cache means
each retry makes forward progress.  Quality (BD-rate) phases force the
CPU backend - their decisions are backend-identical integer math.

Keys:
  value                 AI encode fps, 416x240 QP32 (headline)
  fps_ldp / fps_ra      inter encode fps, 416x240 QP32, low-delay-P and
                        random-access (GOP8) on real camera-like content,
                        with live single-thread HM baselines
  fps_1080p_ra_main10   the NORTH STAR: 1080p random-access Main10
                        frames/s per chip (BASELINE.md target: >=10x HM)
  fps_cpu_pinned        AI encode with the analysis pinned to host CPU
  fps_1080p_ai          1080p AI fps on the accelerator
  ai/ldp/ra_bdrate_pct_vs_hm       BD-rate vs HM (VCEG-M33 fit) at QP
                        {22,27,32,37} on held-out procedural content
  *_bdrate_real_pct_vs_hm          same on REAL camera content (pan/zoom
                        over a photograph, hm16_2_tpu/tools/realclip.py)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

HM_ENC = "/tmp/hmref/bin/TAppEncoderStatic"
HM_CFG = "/tmp/hmref/cfg"
HM_AI_416_FPS_STORED = 8 / 2.896   # same content, encoder_intra_main.cfg, QP32
# Stored single-thread HM fps on this image's host CPU (fallbacks when
# /tmp/hmref is absent), same content as the live runs below.
HM_LDP_416_FPS_STORED = 1.78
HM_RA_416_FPS_STORED = 1.62
HM_RA10_1080P_FPS_STORED = 0.040


def bench_content(frames=9, w=416, h=240, seed=42):
    from make_fixtures import make_yuv
    out = []
    for planes in make_yuv(w, h, frames, seed=seed):
        out.append([p.astype(np.int32) for p in planes])
    return out


def real_content(frames=17, w=416, h=240, bit_depth=8):
    from hm16_2_tpu.tools.realclip import make_clip
    return make_clip(w, h, frames, bit_depth=bit_depth)


LAST_STAGES = {}


def bench_end_to_end(planes, w=416, h=240, **cfg_kw):
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    kw = dict(qp=32, intra_period=1)
    kw.update(cfg_kw)
    enc = Encoder(EncoderConfig(w, h, **kw))
    warm = planes[:10] if kw.get("gop") else planes[:2]
    list(enc.encode_stream(warm))                # jit warmup
    enc = Encoder(EncoderConfig(w, h, **kw))
    t0 = time.time()
    n = sum(1 for _ in enc.encode_stream(planes))
    fps = n / (time.time() - t0)
    LAST_STAGES.clear()
    LAST_STAGES.update({k: round(v / max(n, 1), 1)
                        for k, v in enc.stage_ms.items()})
    return fps


def _run_hm(cfg, src, w, h, n, qp=32, extra=()):
    if not os.path.exists(HM_ENC):
        return None
    t0 = time.time()
    r = subprocess.run(
        [HM_ENC, "-c", os.path.join(HM_CFG, cfg), "-i", src,
         "-wdt", str(w), "-hgt", str(h), "-fr", "30", "-f", str(n),
         "-b", "/tmp/bench_hm.bin", "-o", "/dev/null", "-q", str(qp),
         "--SEIDecodedPictureHash=1", *extra], capture_output=True)
    if r.returncode != 0:
        sys.stderr.write(r.stderr.decode()[-500:] + "\n")
        return None
    return n / (time.time() - t0)


def _real_src_416():
    src = "/tmp/bench_real416.yuv"
    if not os.path.exists(src):
        from hm16_2_tpu.tools.realclip import write_yuv
        write_yuv(src, real_content(17))
    return src


def measure_hm_fps(n=8):
    src = "/tmp/bench416.yuv"
    if not os.path.exists(src):
        from make_fixtures import make_yuv, write_yuv
        write_yuv(src, make_yuv(416, 240, 9, seed=42))
    return _run_hm("encoder_intra_main.cfg", src, 416, 240, n)


def measure_hm_inter_fps(mode, n=16):
    cfg = {"ldp": "encoder_lowdelay_P_main.cfg",
           "ra": "encoder_randomaccess_main.cfg"}[mode]
    return _run_hm(cfg, _real_src_416(), 416, 240, n)


def measure_hm_ra10_1080p_fps(n=9):
    src = "/tmp/bench_real1080_10.yuv"
    if not os.path.exists(src):
        from hm16_2_tpu.tools.realclip import write_yuv
        write_yuv(src, real_content(9, 1920, 1080, bit_depth=10),
                  bit_depth=10)
    return _run_hm("encoder_randomaccess_main10.cfg", src, 1920, 1080, n,
                   extra=("--InputBitDepth=10",))


def measure_bdrate(mode="ai", frames=8, qps=(22, 27, 32, 37), seed=1234,
                   src=None, w=416, h=240):
    """BD-rate vs HM on held-out content (negative = we beat HM)."""
    if not os.path.exists(HM_ENC):
        return None
    if src is None:
        src = f"/tmp/bench416_s{seed}.yuv"
        if not os.path.exists(src):
            from make_fixtures import make_yuv, write_yuv
            write_yuv(src, make_yuv(416, 240, max(frames, 9), seed=seed))
    from hm16_2_tpu.tools import bdrate as bdr
    bd, _ = bdr.run(src, w, h, frames, mode, list(qps), verbose=False)
    return round(bd, 2)


# ---------------------------------------------------------------------------
# phase runner: each phase is a subprocess (TPU crashes stay contained)
# ---------------------------------------------------------------------------

def _phase(name):
    """Executed inside the child: print PHASE_RESULT <float> and exit."""
    if name.startswith("bd_") or name.endswith("_cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    if name == "prewarm":
        # Compile (into the persistent cache) every program the timed
        # phases need, at the exact shapes they use.  Crash-prone cold
        # TPU compiles happen here instead of inside a timed phase.
        from hm16_2_tpu.encode.top import Encoder, EncoderConfig
        for kw, planes, (w, h) in (
            (dict(qp=32, intra_period=1), bench_content(2), (416, 240)),
            (dict(qp=32, intra_period=-1, gop="ldp"),
             real_content(5), (416, 240)),
            (dict(qp=32, intra_period=-1, gop="ra8"),
             real_content(10), (416, 240)),
            (dict(qp=32, intra_period=-1, gop="ra8", bit_depth=10),
             real_content(10, 1920, 1080, bit_depth=10), (1920, 1080)),
        ):
            enc = Encoder(EncoderConfig(w, h, **kw))
            list(enc.encode_stream(planes))
        v = 1.0
    elif name == "ai_fps":
        v = bench_end_to_end(bench_content())
    elif name == "ai_cpu":
        os.environ["HM16_ANALYSIS_CPU"] = "1"
        v = bench_end_to_end(bench_content())
    elif name == "ai_1080":
        v = bench_end_to_end(bench_content(frames=5, w=1920, h=1080),
                             1920, 1080)
    elif name == "ldp_fps":
        v = bench_end_to_end(real_content(17), 416, 240,
                             intra_period=-1, gop="ldp")
    elif name == "ra_fps":
        v = bench_end_to_end(real_content(17), 416, 240,
                             intra_period=-1, gop="ra8")
    elif name == "ra10_1080_fps":
        v = bench_end_to_end(real_content(17, 1920, 1080, bit_depth=10),
                             1920, 1080, intra_period=-1, gop="ra8",
                             bit_depth=10)
    elif name.startswith("bd_"):
        _, mode, content = name.split("_")
        nf = {"ai": 8, "ldp": 8, "ra": 9}[mode]
        if content == "real":
            nf = {"ai": 8, "ldp": 16, "ra": 17}[mode]
            v = measure_bdrate(mode, nf, src=_real_src_416())
        else:
            v = measure_bdrate(mode, nf)
    else:
        raise SystemExit(f"unknown phase {name}")
    if LAST_STAGES:
        # per-frame ms breakdown (plan dispatch+fetch / host commit /
        # filters / pass-2 CABAC / hash+NAL) of the phase's encode
        print("PHASE_STAGES " + json.dumps(LAST_STAGES))
    print(f"PHASE_RESULT {v}")


_T0 = time.time()
_BUDGET = float(os.environ.get("HM16_BENCH_BUDGET_S", "4800"))
_LAST_EXTRAS: dict = {}


def _remaining():
    return _BUDGET - (time.time() - _T0)


def _run_phase(name, retries=2, timeout=1800):
    """Run one phase in a subprocess; never exceed the global budget.

    The axon TPU worker dies roughly half the time when a fresh client
    connects shortly after the previous process exited — those crashes
    happen within seconds and don't consume meaningful budget, so fast
    failures (<120 s) get free retries (bounded) instead of eating the
    per-phase attempt count."""
    attempt = 0
    free_left = 6
    while attempt <= retries:
        t = min(timeout, max(60, _remaining() - 30))
        if _remaining() < 90:
            sys.stderr.write(f"{name}: skipped (budget exhausted)\n")
            return None
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", name],
                capture_output=True, text=True, timeout=t,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
            val = None
            for ln in r.stdout.splitlines():
                if ln.startswith("PHASE_STAGES "):
                    try:
                        _LAST_EXTRAS[name] = json.loads(
                            ln.split(None, 1)[1])
                    except ValueError:
                        pass
                if ln.startswith("PHASE_RESULT "):
                    val = ln.split(None, 1)[1]
            if val is not None:
                return None if val == "None" else float(val)
            sys.stderr.write(
                f"{name} attempt {attempt}: no result "
                f"(rc={r.returncode})\n{r.stderr[-400:]}\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"{name} attempt {attempt}: timeout\n")
        fast_crash = (time.time() - t0) < 120
        if fast_crash and free_left > 0 and _remaining() > 180:
            free_left -= 1
        else:
            attempt += 1
        if attempt <= retries:
            time.sleep(30)
    return None


def _emit(out):
    """Stream the cumulative result line after every phase.

    The driver records the process tail; printing the full JSON object
    each time a phase lands means a timeout still leaves the latest
    complete line on record (round-4 lesson: rc=124 ate everything).
    """
    out["elapsed_s"] = round(time.time() - _T0, 1)
    print(json.dumps(out), flush=True)


def main():
    out = {
        "metric": "AI encode fps (416x240, QP32, end-to-end, 1 TPU chip)",
        "value": None, "unit": "frames/s", "vs_baseline": None,
    }
    _emit(out)

    # Prewarm: populate the persistent XLA compile cache for the big
    # fused plans in a throwaway subprocess.  The first cold compile of
    # the inter plan is what crashed the TPU worker in round 4; doing it
    # here (with retries, untimed) makes every timed phase predictable.
    _run_phase("prewarm", retries=3, timeout=1500)

    fps = _run_phase("ai_fps")
    if fps is None:
        fps = _run_phase("ai_cpu")
    hm_fps = measure_hm_fps()
    baseline = hm_fps if hm_fps else HM_AI_416_FPS_STORED
    out.update({
        "value": round(fps, 4) if fps else None,
        "vs_baseline": round(fps / baseline, 4) if fps else None,
        "hm_fps_same_content": round(baseline, 4),
        "hm_measured_live": bool(hm_fps),
    })
    _emit(out)

    # --- Inter fps on real content (same clip for us and HM) ---
    v = _run_phase("ldp_fps", retries=3)
    if v is not None:
        out["fps_ldp"] = round(v, 4)
        hm_v = measure_hm_inter_fps("ldp")
        out["hm_fps_ldp"] = round(hm_v or HM_LDP_416_FPS_STORED, 4)
        out["ldp_vs_hm"] = round(out["fps_ldp"] / out["hm_fps_ldp"], 2)
        _emit(out)
    v = _run_phase("ra_fps", retries=3)
    if v is not None:
        out["fps_ra"] = round(v, 4)
        hm_v = measure_hm_inter_fps("ra")
        out["hm_fps_ra"] = round(hm_v or HM_RA_416_FPS_STORED, 4)
        out["ra_vs_hm"] = round(out["fps_ra"] / out["hm_fps_ra"], 2)
        _emit(out)

    # --- NORTH STAR: 1080p random-access Main10 fps/chip ---
    v = _run_phase("ra10_1080_fps", timeout=2400)
    if v is not None:
        out["fps_1080p_ra_main10"] = round(v, 4)
        hm_v = measure_hm_ra10_1080p_fps() if _remaining() > 400 else None
        out["hm_fps_1080p_ra_main10"] = round(
            hm_v or HM_RA10_1080P_FPS_STORED, 4)
        out["ra_main10_1080p_vs_hm"] = round(
            v / out["hm_fps_1080p_ra_main10"], 2)
        out["hm_1080p_measured_live"] = bool(hm_v)
        if "ra10_1080_fps" in _LAST_EXTRAS:
            out["stage_ms_1080p"] = _LAST_EXTRAS["ra10_1080_fps"]
        _emit(out)

    # --- BD-rate: quality evidence before the optional extras ---
    out["bdrate_qps"] = [22, 27, 32, 37]
    out["bdrate_content"] = {"synthetic": "make_yuv seed1234 held-out",
                             "real": "realclip grace_hopper pan/zoom"}
    for mode in ("ldp", "ra", "ai"):
        bd = _run_phase(f"bd_{mode}_real", retries=0, timeout=2700)
        if bd is not None:
            out[f"{mode}_bdrate_real_pct_vs_hm"] = round(bd, 2)
            _emit(out)
    for mode in ("ai", "ldp", "ra"):
        bd = _run_phase(f"bd_{mode}_syn", retries=0, timeout=2400)
        if bd is not None:
            out[f"{mode}_bdrate_pct_vs_hm"] = round(bd, 2)
            _emit(out)

    v = _run_phase("ai_1080", retries=1)
    if v is not None:
        out["fps_1080p_ai"] = round(v, 4)
        _emit(out)
    v = _run_phase("ai_cpu", retries=0)
    if v is not None:
        out["fps_cpu_pinned"] = round(v, 4)
    _emit(out)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        _phase(sys.argv[2])
    else:
        main()
