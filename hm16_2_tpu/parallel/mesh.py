"""Device-mesh sharding for the encoder analysis pipeline.

The codec's parallel axes (SURVEY.md section 5): frames/GOPs across the
`frame` axis (data-parallel analogue, DCN at multi-host scale) and CTU rows
within a frame across the `row` axis (sequence-parallel analogue, ICI).
Collectives: per-picture rate/distortion reductions are psums over both
axes; halo exchange for intra references and loop filters rides `row`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hm16_2_tpu.ops import analysis


def make_mesh(devices=None, frame_axis: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if frame_axis is None:
        frame_axis = 2 if n % 2 == 0 and n > 1 else 1
    row_axis = n // frame_axis
    dev = np.array(devices[: frame_axis * row_axis]).reshape(frame_axis, row_axis)
    return Mesh(dev, ("frame", "row"))


def analysis_step(orig, bufs, qp, size: int, bit_depth: int = 8):
    """One fused analysis step on a batch of intra blocks.

    orig: (..., N, s, s) original blocks; bufs: (..., N, 2, 4s+1) refs.
    Returns (best_modes, best_costs, levels, total_cost):
      per-block best intra mode by SATD, the quantized coefficients of the
      best mode's residual, and the summed cost (a collective when sharded).
    """
    preds = analysis.predict_all_modes(bufs, size, True, bit_depth)
    diffs = orig[..., None, :, :] - preds
    costs = analysis.batched_satd(diffs)
    best = jnp.argmin(costs, axis=-1)
    best_cost = jnp.min(costs, axis=-1)
    best_pred = jnp.take_along_axis(
        preds, best[..., None, None, None], axis=-3).squeeze(-3)
    resi = orig - best_pred
    fwd = analysis.batched_fwd_transform(resi, bit_depth, size == 4)
    levels = analysis.batched_quant(fwd, qp, bit_depth,
                                    size.bit_length() - 1, True)
    return best, best_cost, levels, jnp.sum(best_cost)


def sharded_analysis_step(mesh: Mesh, size: int = 16, bit_depth: int = 8):
    """jit the full analysis step over (frame, row) sharded batches.

    Input layout: (F, R, N, ...) — frames x CTU-rows x blocks-per-row.
    The total-cost reduction is a cross-device psum (XLA collective over
    ICI); everything else stays device-local.
    """
    data_spec = NamedSharding(mesh, P("frame", "row"))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(data_spec, data_spec, rep),
             out_shardings=(data_spec, data_spec, data_spec, rep))
    def step(orig, bufs, qp):
        return analysis_step(orig, bufs, qp, size, bit_depth)

    return step


def example_batch(f, r, n, size, rng=None):
    rng = rng or np.random.default_rng(0)
    orig = rng.integers(0, 256, (f, r, n, size, size)).astype(np.int32)
    tops = rng.integers(0, 256, (f, r, n, 2 * size + 1)).astype(np.int64)
    lefts = rng.integers(0, 256, (f, r, n, 2 * size + 1)).astype(np.int64)
    lefts[..., 0] = tops[..., 0]
    from hm16_2_tpu.ops.intra_ref import filter_reference_samples
    sh = tops.shape[:-1]
    bufs = np.zeros(sh + (2, 4 * size + 1), dtype=np.int32)
    flat_t = tops.reshape(-1, 2 * size + 1)
    flat_l = lefts.reshape(-1, 2 * size + 1)
    flat_b = bufs.reshape(-1, 2, 4 * size + 1)
    for i in range(flat_t.shape[0]):
        tf, lf = filter_reference_samples(flat_t[i], flat_l[i], size, 8, False)
        flat_b[i] = analysis.pack_ref_buffers(
            flat_t[i:i + 1], flat_l[i:i + 1], tf[None], lf[None])[0]
    return orig, bufs
