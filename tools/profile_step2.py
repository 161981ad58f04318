"""Finer timing of the post-interpolation region of the ISL step."""

import time

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.ops.reduce import bfb_sum
from compose_tpu.transport import (IslConfig, IslTransport, dss, gallery,
                                   limiter as limmod, spf)


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    print(f"{name:28s} {(time.time()-t0)/n*1e3:8.2f} ms")
    return out


def main():
    ne, np_, nt = 30, 4, 40
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                    rho_isl=True, nsub=8, geom_dtype="f32")
    model = IslTransport(mesh, wind, cfg)
    rho = jnp.ones((mesh.ncell, mesh.np2))
    q1 = driver.init_tracers(
        mesh, ["gaussianhills", "slottedcylinders", "cosinebells", "xyztrig"])
    q = jnp.tile(q1, (10, 1, 1))[:nt]
    dt = 86400.0 * 12 / 120
    m = mesh
    F = model.F
    Ff = F.reshape(-1)

    print(f"platform: {jax.devices()[0].platform}")
    dep, ci, w = jax.jit(model._departure_data)(0.0, dt)

    q_tgt = timeit("interp+scatter", jax.jit(
        lambda q: model._interp(q, ci, w)[:, model.d2c_map].reshape(
            nt, m.ncell, m.np2)), q)
    rho_tgt = rho

    def bounds(q):
        q_min_cell = jnp.min(q, axis=-1)
        q_max_cell = jnp.max(q, axis=-1)
        nsc = ci[model.d2c_map].reshape(m.ncell, m.np2)
        return q_min_cell[:, nsc], q_max_cell[:, nsc]
    qmin_n, qmax_n = timeit("bounds gather", jax.jit(bounds), q)

    def records(q_tgt, qmin_n, qmax_n):
        rhom = F[None] * rho_tgt[None]
        return (jnp.sum(rhom * qmin_n, -1), jnp.sum(rhom * qmax_n, -1),
                jnp.sum(F[None] * q_tgt * rho_tgt[None], -1))
    Qc_min, Qc_max, Qc_mass = timeit("records", jax.jit(records),
                                     q_tgt, qmin_n, qmax_n)

    redist = timeit("redistribute (caas)", jax.jit(
        lambda a, b, c: model.mrd.redistribute(
            jnp.sum(F * rho_tgt, -1), a, c, b, jnp.zeros(nt))),
        Qc_min, Qc_max, Qc_mass)

    Q = q_tgt * rho_tgt[None]
    delta = redist - Qc_mass
    lim = timeit("limit_tracer (caas)", jax.jit(jax.vmap(
        lambda Qi, a, b, d: limmod.limit_tracer(
            F, rho_tgt, Qi, a, b, d, limiter="caas"))),
        Q, qmin_n, qmax_n, delta)

    timeit("Q->q + clip", jax.jit(
        lambda Q: jnp.clip(Q / jnp.where(rho_tgt == 0, 1., rho_tgt)[None],
                           qmin_n, qmax_n)), lim)

    timeit("dss_q", jax.jit(
        lambda qn: dss.dss_q(rho_tgt.reshape(-1), qn.reshape(nt, -1),
                             model.d2c_map, Ff, m.cnn)), q_tgt)

    timeit("rho path (jac+cdr+dss)", jax.jit(
        lambda rho, q: model._step_impl(rho, q[:1], 0.0, dt)), rho, q)


if __name__ == "__main__":
    main()
