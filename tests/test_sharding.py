"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the full
transport step compiles and executes cell-sharded, agrees with the
single-device result, and the BFB reductions are decomposition-invariant
(the reference's BfbTreeAllReducer contract,
cedr_bfb_tree_allreduce.hpp:11-14)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compose_tpu import driver
from compose_tpu.mesh import build
from compose_tpu.ops.reduce import bfb_sum
from compose_tpu.parallel import cell_mesh, shard_state, sharded_step
from compose_tpu.transport import IslConfig, IslTransport, gallery


def _model(ne=4):
    mesh = build(ne, 4)
    wind = gallery.create_wind("divergent")
    cfg = IslConfig(ne=ne, np_=4, filter="caas", limiter="caas",
                    rho_isl=True, nsub=2)
    model = IslTransport(mesh, wind, cfg)
    rho = jnp.ones((mesh.ncell, mesh.np2))
    q = driver.init_tracers(mesh, ("gaussianhills", "slottedcylinders"))
    return model, rho, q


def test_bfb_sum_decomposition_invariant():
    # The fixed-tree sum must be bitwise identical for any contiguous
    # blocking of the same global array.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(1024))
    whole = bfb_sum(x)
    # Two-block tree: with the power-of-two fold-in-half tree, the root
    # combines the two half-sums, each of which is itself the tree sum of
    # its half.
    half = bfb_sum(x[:512]) + bfb_sum(x[512:])
    assert float(whole) == float(half)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_step_matches_single_device(ndev):
    assert len(jax.devices()) >= ndev
    model, rho, q = _model()
    dt = 86400.0
    ref_rho, ref_q = model.step(rho, q, 0.0, dt)

    mesh = cell_mesh(ndev)
    rho_s, q_s = shard_state(mesh, rho, q)
    step = sharded_step(model, mesh)
    out_rho, out_q = step(rho_s, q_s, 0.0, dt)

    dr = float(jnp.max(jnp.abs(out_rho - ref_rho)))
    dq = float(jnp.max(jnp.abs(out_q - ref_q)))
    # GSPMD may re-partition elementwise work but the fixed-tree reductions
    # pin the global sums; demand near-bitwise agreement.
    assert dr < 1e-13, dr
    assert dq < 1e-13, dq


def test_halo_exchange_bitwise():
    """The O(perimeter) halo exchange (parallel/halo.py) reproduces the
    global-gather departure interpolation BITWISE on an 8-device mesh, and
    its coverage check validates the CFL/halo-depth assumption
    (slmmir_remapper.cpp:7)."""
    import numpy as np
    import jax
    from compose_tpu import driver
    from compose_tpu.mesh import cubed_sphere
    from compose_tpu.transport import IslConfig, IslTransport, gallery
    from compose_tpu.parallel import halo, sharding

    ne, np_, nt = 16, 4, 3
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                    rho_isl=True, nsub=2)
    model = IslTransport(mesh, wind, cfg)
    q = driver.init_tracers(mesh, ("gaussianhills", "cosinebells",
                                   "xyztrig"))
    dt = 86400.0 * 12 / 120
    _, ci, w = jax.jit(model._departure_data)(0.0, dt)
    ref = model._interp(q, ci, w)[:, model.d2c_map].reshape(
        nt, mesh.ncell, mesh.np2)

    dmesh = sharding.cell_mesh(8)
    maps = halo.HaloMaps(mesh, 8, depth=2)
    assert maps.coverage_ok(ci, model.d2c_map, mesh.np2)
    assert maps.comm_fraction < 1.0
    out = halo.halo_interp(dmesh, maps, q, ci, w, model.d2c_map)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() == 0.0
