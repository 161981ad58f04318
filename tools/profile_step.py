"""Phase-level timing of the flagship ISL step on the current platform.

Not part of the benchmark contract - a developer tool to see where the step
time goes (trajectories / locate+invert / interp / rho CDR / tracer CDR /
DSS) before optimizing.
"""

import time

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, gallery, timeint
from compose_tpu.ops import sqr
from compose_tpu.mesh.cubed_sphere import get_cell_idx


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms")
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

    print(f"platform: {jax.devices()[0].platform}, "
          f"x64: {jax.config.read('jax_enable_x64')}")

    traj = jax.jit(lambda: timeint.integrate(
        wind.velocity, dt, 0.0, mesh.cgll_xyz, 8))
    dep = timeit("trajectories (nsub=8)", traj)

    locate = jax.jit(lambda d: get_cell_idx(ne, d))
    ci = timeit("get_cell_idx", locate, dep)

    invert = jax.jit(lambda d, c: sqr.sphere_to_ref(mesh.corners[c], d))
    timeit("sphere_to_ref", invert, dep, ci)

    depdata = jax.jit(model._departure_data)
    dep_, ci_, w = timeit("departure_data (all)", depdata, 0.0, dt)

    interp = jax.jit(model._interp)
    timeit("interp 40 tracers", interp, q, ci_, w)

    jacd = jax.jit(model._jacobian_departure)
    timeit("jacobian_departure", jacd, dep_)

    step = jax.jit(model._step_impl)
    timeit("FULL STEP", step, rho, q, 0.0, dt, n=10)

    # No-filter variant to isolate CDR+limiter cost.
    cfg2 = IslConfig(ne=ne, np_=np_, filter="none", limiter="none",
                     rho_isl=True, nsub=8, geom_dtype="f32")
    model2 = IslTransport(mesh, wind, cfg2)
    step2 = jax.jit(model2._step_impl)
    timeit("step w/o CDR", step2, rho, q, 0.0, dt, n=10)

    # Single-tracer step to split fixed vs per-tracer cost.
    step1 = jax.jit(model._step_impl)
    timeit("step nt=1", step1, rho, q[:1], 0.0, dt, n=10)


if __name__ == "__main__":
    main()
