"""Micro-timing of the CDR/limiter/DSS region pieces."""

import time

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import (IslConfig, IslTransport, dss, gallery,
                                   limiter as limiter_mod)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    print(f"{name:34s} {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


def main():
    ne, np_, nt = 30, 4, 40
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                    rho_isl=True, nsub=8, geom_dtype="f32",
                    interp_dtype="f32")
    model = IslTransport(mesh, wind, cfg)
    m = mesh
    F = model.F
    rho = jnp.ones((mesh.ncell, mesh.np2))
    q1 = driver.init_tracers(
        mesh, ["gaussianhills", "slottedcylinders", "cosinebells", "xyztrig"])
    q = jnp.tile(q1, (10, 1, 1))[:nt]
    rng = jax.random.PRNGKey(0)
    ci = jax.random.randint(rng, (m.cnn,), 0, m.ncell)

    # 1. dss_q (the tracer DSS)
    timeit("dss_q_gather_t", jax.jit(
        lambda qn: dss.dss_q_gather_t(rho.reshape(-1), qn.reshape(nt, -1),
                                      model.d2c_map, m.c2d_idx, m.c2d_mask,
                                      F.reshape(-1))), q)

    # 2. bounds gather (tracer-innermost)
    def bounds(q, ci):
        q_min_cell = jnp.min(q, axis=-1)
        q_max_cell = jnp.max(q, axis=-1)
        nsc = ci[model.d2c_map].reshape(m.ncell, m.np2)
        qmm = jnp.stack([q_min_cell, q_max_cell])
        qmm_n = jnp.moveaxis(
            jnp.moveaxis(qmm, (0, 1), (-2, -1))[nsc], (-2, -1), (0, 1))
        return qmm_n[0], qmm_n[1]
    qmin_n, qmax_n = timeit("bounds gather", jax.jit(bounds), q, ci)

    # 3. records + redistribute + limiter + clip (elementwise f64)
    def cdrlim(q, qmin_n, qmax_n):
        Q = q * rho[None]
        rhom = F[None] * rho[None]
        Qc_min = jnp.sum(rhom * qmin_n, -1)
        Qc_max = jnp.sum(rhom * qmax_n, -1)
        Qc_mass = jnp.sum(F[None] * Q, -1)
        redist = model.mrd.redistribute(
            jnp.sum(F * rho, -1), Qc_min, Qc_mass, Qc_max, jnp.zeros(nt))
        delta = redist - Qc_mass
        lim = jax.vmap(lambda Qi, a, b, d: limiter_mod.limit_tracer(
            F, rho, Qi, a, b, d, limiter="caas"))
        Q = lim(Q, qmin_n, qmax_n, delta)
        return jnp.clip(Q / rho[None], qmin_n, qmax_n)
    timeit("records+caas+limit+clip", jax.jit(cdrlim), q, qmin_n, qmax_n)

    # 4. rho path: jacobian + rho CDR + rho DSS
    timeit("rho-only step", jax.jit(
        lambda rho, q1: model._step_impl(rho, q1, 0.0, 86400.0)), rho, q[:1])


if __name__ == "__main__":
    main()
