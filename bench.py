"""Benchmark entry point (driver-run, one JSON line on stdout).

Headline: end-to-end All-Intra encode frames/s at 416x240 QP32 vs the
reference encoder's single-thread speed on the same class of content
(measured: 16 frames in 13.065 s = 1.223 fps, encoder_intra_main.cfg).

Also measured (stderr): TPU batched intra-analysis throughput (the jitted
35-mode predict + SATD + transform + quant pipeline), expressed as
equivalent 1080p frames/s of analysis work.
"""

import json
import sys
import time

import numpy as np

HM_AI_416_FPS = 16 / 13.065   # reference single-thread baseline (BASELINE.md)


def synthetic_planes(w, h, t, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = ((xx * 2 + yy + t * 7) % 256 * 0.6 +
         0.4 * rng.integers(0, 256, (h, w))).astype(np.int32)
    u = ((xx // 2 + t) % 256)[::2, ::2].astype(np.int32)
    v = ((yy // 2 + 2 * t) % 256)[::2, ::2].astype(np.int32)
    return [np.clip(y, 0, 255), u, v]


def bench_end_to_end(frames=4, w=416, h=240):
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    rng = np.random.default_rng(7)
    enc = Encoder(EncoderConfig(w, h, qp=32))
    planes = [synthetic_planes(w, h, t, rng) for t in range(frames)]
    enc.encode_frame(planes[0], 1000)     # warmup: jit-compile analysis path
    t0 = time.time()
    n = 0
    for t, p in enumerate(planes):
        enc.encode_frame(p, t)
        n += 1
    dt = time.time() - t0
    return n / dt


def bench_tpu_analysis(size=16, batch=2048, iters=10):
    import jax
    import jax.numpy as jnp
    from hm16_2_tpu.parallel.mesh import analysis_step

    rng = np.random.default_rng(0)
    orig = jnp.asarray(rng.integers(0, 256, (batch, size, size)), jnp.int32)
    bufs = jnp.asarray(rng.integers(0, 256, (batch, 2, 4 * size + 1)), jnp.int32)
    qp = jnp.int32(32)
    fn = jax.jit(lambda o, b, q: analysis_step(o, b, q, size))
    jax.block_until_ready(fn(orig, bufs, qp))   # compile
    t0 = time.time()
    for _ in range(iters):
        out = fn(orig, bufs, qp)
    jax.block_until_ready(out)
    dt = time.time() - t0
    blocks_per_s = batch * iters / dt
    blocks_per_1080p = (1920 // size) * (1088 // size)
    return blocks_per_s, blocks_per_s / blocks_per_1080p


def main():
    fps = bench_end_to_end()
    try:
        blk_s, frames_1080p = bench_tpu_analysis()
        print(f"tpu intra-analysis: {blk_s:,.0f} blocks/s "
              f"= {frames_1080p:,.1f} 1080p-frames/s of analysis",
              file=sys.stderr)
    except Exception as e:  # TPU may be absent in some environments
        print(f"tpu analysis bench skipped: {e}", file=sys.stderr)
    print(json.dumps({
        "metric": "AI encode fps (416x240, QP32, end-to-end)",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / HM_AI_416_FPS, 4),
    }))


if __name__ == "__main__":
    main()
