"""Cumulative-prefix phase timing of the flagship ISL step (few compiles)."""

import time

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.ops.reduce import bfb_sum
from compose_tpu.transport import (IslConfig, IslTransport, gallery,
                                   limiter as limiter_mod, spf)


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return out, dt


def main():
    ne, np_, nt = 30, 4, 40
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                    rho_isl=True, nsub=8, geom_dtype="f32",
                    interp_dtype="f32")
    model = IslTransport(mesh, np2 := None or wind, cfg) if False else \
        IslTransport(mesh, wind, cfg)
    rho = jnp.ones((mesh.ncell, mesh.np2))
    q1 = driver.init_tracers(
        mesh, ["gaussianhills", "slottedcylinders", "cosinebells", "xyztrig"])
    q = jnp.tile(q1, (10, 1, 1))[:nt]
    dt = 86400.0 * 12 / 120
    m = mesh

    def prefix_dep(rho, q):
        return model._departure_data(0.0, dt)

    def prefix_interp(rho, q):
        dep, ci, w = model._departure_data(0.0, dt)
        rho_interp = model._interp(rho, ci, w)
        Jdep = model._jacobian_departure(dep)
        rho_tgt = (Jdep / m.jac_node) * rho_interp[model.d2c_map].reshape(
            m.ncell, m.np2)
        q_interp = model._interp(q.astype(jnp.float32), ci,
                                 w.astype(jnp.float32)).astype(jnp.float64)
        q_tgt = jnp.moveaxis(
            jnp.moveaxis(q_interp, 0, -1)[model.d2c_map], -1, 0).reshape(
                nt, m.ncell, m.np2)
        return rho_tgt, q_tgt

    full = jax.jit(model._step_impl)

    _, t_dep = timeit("departure data", jax.jit(prefix_dep), rho, q)
    _, t_int = timeit("+ interp/scatter/jac", jax.jit(prefix_interp), rho, q)
    _, t_all = timeit("full step", full, rho, q, 0.0, dt)
    print(f"{'-> interp region':34s} {t_int - t_dep:8.2f} ms")
    print(f"{'-> cdr+limiter+dss region':34s} {t_all - t_int:8.2f} ms")


if __name__ == "__main__":
    main()
