"""Experiment: DSS formulations (the #2 kernel after interp).

Current dss_q_gather indexes the LAST axis with a (cnn, 4) map - a
scalar-granularity gather. Candidates restructure so gather rows are wide,
and/or process only multiplicity>=2 nodes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, dss, gallery


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    print(f"{name:36s} {(time.time()-t0)/n*1e3:8.2f} ms")
    return out


def main():
    ne, np_, nt = 30, 4, 40
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                    rho_isl=True, nsub=8, geom_dtype="f32")
    model = IslTransport(mesh, wind, cfg)
    q1 = driver.init_tracers(
        mesh, ["gaussianhills", "slottedcylinders", "cosinebells", "xyztrig"])
    q = jnp.tile(q1, (10, 1, 1))[:nt]
    rho = jnp.ones((mesh.ncell, mesh.np2))
    rho_f = rho.reshape(-1)
    qf = q.reshape(nt, -1)
    m = mesh
    F = model.F.reshape(-1)
    print(f"platform: {jax.devices()[0].platform}")

    d2c_map, c2d_idx, c2d_mask = model.d2c_map, m.c2d_idx, m.c2d_mask

    def d0(rho_f, qf):
        return dss.dss_q_gather(rho_f, qf, d2c_map, c2d_idx, c2d_mask, F)
    timeit("d0 current dss_q_gather", jax.jit(d0), rho_f, qf)

    # d1: tracer-innermost.
    qT = jnp.moveaxis(qf, 0, -1) + 0.0           # (dnn, nt)
    wq = F * rho_f

    def d1(qT):
        vals = qT[c2d_idx]                       # (cnn, 4, nt)
        w = jnp.where(c2d_mask, wq[c2d_idx], 0.0)[..., None]
        num = jnp.sum(w * vals, axis=-2)
        den = jnp.sum(w, axis=-2)
        cg = num / den
        big = jnp.where(c2d_mask[..., None], vals, -jnp.inf)
        small = jnp.where(c2d_mask[..., None], vals, jnp.inf)
        cg = jnp.clip(cg, jnp.min(small, -2), jnp.max(big, -2))
        return cg[d2c_map]                       # (dnn, nt)
    timeit("d1 tracer-innermost", jax.jit(d1), qT)

    # d2: multiplicity>=2 only (edge nodes), identity elsewhere.
    mult = np.asarray(m.c2d_mask).sum(1)
    edge_nodes = np.where(mult >= 2)[0]
    e_idx = jnp.asarray(np.asarray(m.c2d_idx)[edge_nodes])     # (ne2, 4)
    e_mask = jnp.asarray(np.asarray(m.c2d_mask)[edge_nodes])
    # all dgll slots covered by edge nodes, and their cg source row
    slots = np.asarray(m.c2d_idx)[edge_nodes]
    msk = np.asarray(m.c2d_mask)[edge_nodes]
    flat_slots = jnp.asarray(slots[msk])                        # (nslot,)
    flat_rows = jnp.asarray(np.repeat(np.arange(len(edge_nodes)),
                                      msk.sum(1)))

    def d2(qf):
        vals = qf[..., e_idx]                    # (nt, ne2, 4)
        w = jnp.where(e_mask, wq[e_idx], 0.0)
        num = jnp.sum(w * vals, axis=-1)
        den = jnp.sum(w, axis=-1)
        cg = num / den
        big = jnp.where(e_mask, vals, -jnp.inf)
        small = jnp.where(e_mask, vals, jnp.inf)
        cg = jnp.clip(cg, jnp.min(small, -1), jnp.max(big, -1))
        out = qf.at[..., flat_slots].set(cg[..., flat_rows])
        return out
    timeit("d2 edges-only", jax.jit(d2), qf)

    # Verify d2 == d0.
    r0 = np.asarray(jax.jit(d0)(rho_f, qf))
    r2 = np.asarray(jax.jit(d2)(qf))
    print("d2 vs d0 max diff", np.abs(r0 - r2).max())
    r1 = np.asarray(jnp.moveaxis(jax.jit(d1)(qT), -1, 0))
    print("d1 vs d0 max diff", np.abs(r0 - r1).max())


if __name__ == "__main__":
    main()
