"""Row-sharded frame analysis: bit-exactness of the sharded encode.

The real AI encode with stage 1 sharded over a multi-device `row` mesh
(halo rows exchanged via ppermute) must produce byte-identical Annex-B
output to the single-device path.  Runs on the virtual 8-device CPU mesh
set up by conftest.py — the same path the driver's dryrun_multichip
validates.
"""

import numpy as np
import pytest


def _content(w, h, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin(xx / 17.0) * np.cos(yy / 13.0)
         + rng.normal(0, 2, (h, w))).clip(0, 255).astype(np.int32)
    u = (128 + 20 * np.sin(xx[::2, ::2] / 9.0)).astype(np.int32)
    v = (128 - 20 * np.cos(yy[::2, ::2] / 11.0)).astype(np.int32)
    return [y, u, v]


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_encode_bit_exact(n_dev):
    import jax

    devices = jax.devices("cpu")
    if len(devices) < n_dev:
        pytest.skip("not enough virtual devices")
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode import intra_rd
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    from hm16_2_tpu.parallel.frame_shard import (
        make_row_mesh, sharded_plan_frame)

    mesh = make_row_mesh(devices[:n_dev])
    w, h = 128, max(64, n_dev * 32)
    planes = _content(w, h)

    def encode(use_mesh):
        enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=1))
        if not use_mesh:
            return enc.encode_frame([p.copy() for p in planes], 0)
        orig_pf = intra_rd.plan_frame

        def pf(orig, sps, qp, lam, cw, cqps, device=None):
            return sharded_plan_frame(mesh, orig, sps, qp, lam, cw, cqps)

        intra_rd.plan_frame = pf
        try:
            return enc.encode_frame([p.copy() for p in planes], 0)
        finally:
            intra_rd.plan_frame = orig_pf

    au_sharded = encode(True)
    au_single = encode(False)
    assert au_sharded == au_single
    pics = Decoder().decode_stream(au_sharded)
    assert len(pics) == 1 and pics[0].hash_ok is True


@pytest.mark.slow
def test_sharded_inter_plan_bit_exact():
    """The fused inter plan with its integer-ME stage row-banded over
    the mesh (parallel/plan_shard.py) produces a byte-identical LDP
    stream — the same property dryrun_multichip asserts on an RA GOP."""
    import jax

    devices = jax.devices("cpu")
    if len(devices) < 2:
        pytest.skip("not enough virtual devices")
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode import inter_plan
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    from hm16_2_tpu.parallel.frame_shard import make_row_mesh

    mesh = make_row_mesh(devices[:2])
    w, h = 128, 128                      # 2 devices x one 64-row band
    frames = [_content(w, h, seed=s) for s in (1, 2, 3)]
    for i, f in enumerate(frames[1:], 1):
        f[0][:] = np.roll(frames[0][0], 3 * i, axis=1)

    def encode(use_mesh):
        enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=-1,
                                    gop="ldp"))
        if not use_mesh:
            return b"".join(enc.encode_stream(
                [[p.copy() for p in f] for f in frames]))
        orig_ip = inter_plan.plan_frame

        def ip(orig_y, sps, sh, rc, prev_mv8, lam, lam_sqrt, device,
               mesh_=None):
            return orig_ip(orig_y, sps, sh, rc, prev_mv8, lam, lam_sqrt,
                           device, mesh=mesh)

        inter_plan.plan_frame = ip
        try:
            return b"".join(enc.encode_stream(
                [[p.copy() for p in f] for f in frames]))
        finally:
            inter_plan.plan_frame = orig_ip

    bs_sharded = encode(True)
    bs_single = encode(False)
    assert bs_sharded == bs_single
    pics = Decoder().decode_stream(bs_sharded)
    assert len(pics) == 3 and all(p.hash_ok is True for p in pics)
