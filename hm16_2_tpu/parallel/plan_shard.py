"""Row-sharded integer ME for the fused inter frame plan.

Shards stage 1 of encode/inter_plan.py — the dense +-64 integer motion
search (coarse 4x-downsampled SSD pyramid + full-res refinement), the
dominant FLOPs of a P/B frame plan — across a `row` device mesh: each
device computes the ME grids for its 64-multiple band of block rows
while the reference planes ride the interconnect once via `all_gather`
(SURVEY.md section 5's inter exchange set; the TEncSlice.cpp:736-756
WPP row-parallel analogue).  Band boundaries are 64-multiples, so every
coarse-pyramid sum and refinement window is identical to the
single-device computation and the produced grids — and therefore the
plan and the bitstream — are bit-identical (asserted by
__graft_entry__.dryrun_multichip and tests/test_frame_shard.py).

The remaining fused plan stages (subpel planes, fractional refinement,
pricing, residual trials, quadtree DP) run unsharded on the lead device
with the grids passed in (`inter_plan._plan_device(me=..., has_me=True)`),
mirroring how frame_shard.sharded_plan_frame host-materializes the
sharded intra stage-1 grids.
"""

from __future__ import annotations

import numpy as np

from hm16_2_tpu._jaxcache import ensure_cache

ensure_cache()

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from hm16_2_tpu.encode import inter_plan

_STEP_CACHE: dict = {}


def _mesh_key(mesh):
    return tuple(id(d) for d in mesh.devices.flat)


def shardable(mesh, h: int, w: int, parts: bool) -> bool:
    """The banded ME is exact only when every device holds a whole
    number of 64-row CTU bands (and the frame has full 64-columns)."""
    n_dev = mesh.devices.size
    return (parts and n_dev > 1 and h % (n_dev * 64) == 0 and w >= 64)


def sharded_int_me(mesh, cur, refs, mvn16, dists, lam_sqrt, h: int,
                   w: int):
    """Integer-ME grids for the inter plan, row-banded over the mesh.

    cur: (h, w) int32 original luma; refs: (R, h, w) int32 unique
    reference planes (already padded to the plan's fixed R); mvn16:
    (h//8, w//8, 2) POC-normalized motion prior; dists: (R,) signed POC
    distances.  Returns the host pytree (sq, rect) that
    inter_plan._plan_device accepts as its `me` input."""
    n_dev = mesh.devices.size
    R = refs.shape[0]
    band = h // n_dev
    key = (_mesh_key(mesh), R, h, w)
    step = _STEP_CACHE.get(key)
    if step is None:
        def band_me(cur_b, refs_b, mvn_b, dists_, lams_):
            refs_full = jax.lax.all_gather(refs_b, "row", axis=1,
                                           tiled=True)
            idx = jax.lax.axis_index("row")
            y0 = idx * band
            mv_cap = inter_plan.MARGIN - inter_plan.REFINE_R - 8
            mvp_full = jnp.clip(jnp.rint(
                mvn_b[None].astype(jnp.float32) *
                dists_[:, None, None, None].astype(jnp.float32) / 64.0
            ).astype(jnp.int32), -mv_cap, mv_cap)
            sq, rect = inter_plan._int_me_grids(
                cur_b, refs_full, mvp_full, lams_, band, w, True, y0=y0)
            return (sq[8], sq[16], sq[32], sq[64],
                    rect[(16, 1)], rect[(16, 2)], rect[(32, 1)],
                    rect[(32, 2)], rect[(64, 1)], rect[(64, 2)])

        gspec = P(None, "row", None, None)
        step = jax.jit(shard_map(
            band_me, mesh=mesh,
            in_specs=(P("row", None), P(None, "row", None),
                      P("row", None, None), P(None), P()),
            out_specs=(gspec,) * 10, check_rep=False))
        _STEP_CACHE[key] = step

    args = (
        jax.device_put(jnp.asarray(cur, jnp.int32),
                       NamedSharding(mesh, P("row", None))),
        jax.device_put(jnp.asarray(refs, jnp.int32),
                       NamedSharding(mesh, P(None, "row", None))),
        jax.device_put(jnp.asarray(mvn16, jnp.int32),
                       NamedSharding(mesh, P("row", None, None))),
        jnp.asarray(dists, jnp.int32),
        jnp.float32(lam_sqrt),
    )
    out = [np.asarray(o) for o in step(*args)]
    sq = {8: out[0], 16: out[1], 32: out[2], 64: out[3]}
    rect = {(16, 1): out[4], (16, 2): out[5], (32, 1): out[6],
            (32, 2): out[7], (64, 1): out[8], (64, 2): out[9]}
    return sq, rect
