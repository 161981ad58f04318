"""Experiment: memory layouts for the ISL gather+contract (the hot kernel).

Current formulation gathers (nt, cnn, np2) from q (nt, ncell, np2) with a
per-node cell index - row size np2*8 B per tracer. Candidates move the
tracer axis innermost so each gathered row is np2*nt*8 B (one big DMA per
node instead of nt small ones).
"""

import time

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, gallery


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
    dt = 86400.0 * 12 / 120
    print(f"platform: {jax.devices()[0].platform}")
    dep, ci, w = jax.jit(model._departure_data)(0.0, dt)
    cnn, np2 = mesh.cnn, mesh.np2

    # v0: current (nt, ncell, np2) gather + einsum.
    def v0(q):
        src = q[:, ci, :]
        return jnp.einsum('ncx,cx->nc', src, w)
    timeit("v0 current (nt,ncell,np2)", jax.jit(v0), q)

    # v1: tracer-innermost gather (ncell, np2, nt).
    qT = jnp.moveaxis(q, 0, -1) + 0.0  # materialized copy
    def v1(qT):
        src = qT[ci]                       # (cnn, np2, nt)
        return jnp.einsum('cxn,cx->nc', src, w)
    timeit("v1 gather (ncell,np2,nt)", jax.jit(v1), qT)

    # v1t: incl. the transposes to/from the step's (nt, ...) layout.
    def v1t(q):
        qT_ = jnp.moveaxis(q, 0, -1)
        src = qT_[ci]
        return jnp.einsum('cxn,cx->nc', src, w)
    timeit("v1t with transpose", jax.jit(v1t), q)

    # v2: flat big-row take.
    qF = qT.reshape(mesh.ncell, np2 * nt)
    def v2(qF):
        src = jnp.take(qF, ci, axis=0).reshape(cnn, np2, nt)
        return jnp.einsum('cxn,cx->nc', src, w)
    timeit("v2 flat take", jax.jit(v2), qF)

    # v3: weights broadcast as matmul: (cnn, 1, np2) @ (cnn, np2, nt).
    def v3(qT):
        src = qT[ci]
        return jax.lax.batch_matmul(
            w[:, None, :], src)[:, 0, :].T
    timeit("v3 batch_matmul", jax.jit(v3), qT)

    # DSS region cost for reference.
    rho = jnp.ones((mesh.ncell, mesh.np2))
    timeit("dss_q 40 tracers", jax.jit(model._dss_q), rho, q)
    timeit("dss rho", jax.jit(model._dss), rho)


if __name__ == "__main__":
    main()
