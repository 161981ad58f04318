"""Round-5 probe: where do departure and dss_q actually spend time on TPU.

Run from /root/repo (axon plugin needs cwd importable, no PYTHONPATH).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, gallery, timeint


def tm(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ne, np_, nt = 30, 4, 40
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                    rho_isl=True, nsub=8, geom_dtype="f32",
                    interp_dtype="f32")
    model = IslTransport(mesh, wind, cfg)
    dt = 86400.0 * 12 / 120

    nodes32 = mesh.cgll_xyz.astype(jnp.float32)
    # 1. departure integrate vs nsub
    for nsub in (1, 2, 4, 8):
        f = jax.jit(lambda p, n=nsub: timeint.integrate(
            wind.velocity, dt, 0.0, p, n))
        print(f"integrate nsub={nsub}: {tm(f, nodes32)*1e3:.3f} ms")
    # 2. full _departure_data
    f = jax.jit(model._departure_data)
    print(f"departure_data total: {tm(f, 0.0, dt)*1e3:.3f} ms")
    # 3. locate + newton alone
    dep, ci, w = jax.jit(model._departure_data)(0.0, dt)
    f = jax.jit(lambda d: cubed_sphere.locate(mesh, d))
    print(f"locate: {tm(f, dep)*1e3:.3f} ms")
    # 4. dss_q f64 XLA roll path
    rho = jnp.ones((mesh.ncell, mesh.np2), jnp.float64)
    q = jnp.abs(jnp.sin(jnp.arange(nt * mesh.ncell * mesh.np2,
                                   dtype=jnp.float64))).reshape(
        nt, mesh.ncell, mesh.np2)
    f = jax.jit(model._dss_q)
    print(f"dss_q f64 (roll XLA): {tm(f, rho, q)*1e3:.3f} ms")
    # 5. dss_q components: merge_add of nt+1 f64 rows
    fd = model.face_dss
    qf = q.reshape(nt, -1)
    wf = (fd.F * rho).reshape(1, -1)
    f = jax.jit(fd._merge_add)
    big = jnp.concatenate([qf, wf], axis=0)
    print(f"merge_add {nt+1} rows f64: {tm(f, big)*1e3:.3f} ms")
    f = jax.jit(lambda a: fd._merge_op(a, jnp.minimum))
    print(f"merge_op min {nt} rows f64: {tm(f, qf)*1e3:.3f} ms")
    # f32 pallas for comparison
    f = jax.jit(lambda w_, q_: fd._pallas_q(w_, q_))
    print(f"pallas f32 dss_q: {tm(f, wf.astype(jnp.float32), qf.astype(jnp.float32))*1e3:.3f} ms")
    # 6. fix_q alone
    f = jax.jit(lambda cgv, qfv, wfv: fd._fix_q(cgv, qfv, wfv, fd.F.reshape(-1)))
    print(f"fix_q f64: {tm(f, qf, qf, wf[0])*1e3:.3f} ms")
    # 7. rho single-row dss f64
    f = jax.jit(lambda r: fd.dss(r))
    print(f"dss rho f64: {tm(f, rho)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
