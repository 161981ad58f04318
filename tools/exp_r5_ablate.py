"""Round-5 ablation: in-context phase costs by stubbing phases inside the
full jitted step, plus compiled kernel counts."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, gallery


def tm_step(model, rho, q, dt, iters=20):
    out = model.step(rho, q, 0.0, dt)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = model.step(rho, q, i * dt, (i + 1) * dt)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def kernel_count(model, rho, q, dt):
    tables = (model.F, model.mesh.jac_node)
    lowered = jax.jit(model._step_impl).lower(
        rho, q, 0.0, dt, mesh_tables=tables)
    txt = lowered.compile().as_text()
    # Count ENTRY-computation ops (rough thunk proxy): fusion/custom-call/...
    import re
    m = re.search(r"ENTRY [^{]*\{(.*?)\n\}", txt, re.S)
    body = m.group(1) if m else txt
    ops = [ln for ln in body.splitlines()
           if "=" in ln and "parameter(" not in ln]
    kinds = {}
    for ln in ops:
        mm = re.search(r"= \S+ (\w+)\(", ln) or re.search(r"= (\w+)\(", ln)
        k = mm.group(1) if mm else "?"
        kinds[k] = kinds.get(k, 0) + 1
    return len(ops), kinds


def main():
    ne, np_, nt = 30, 4, 40
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    dt = 86400.0 * 12 / 120
    rho = jnp.ones((mesh.ncell, mesh.np2), jnp.float64)
    q1 = driver.init_tracers(mesh, ["gaussianhills", "slottedcylinders",
                                    "cosinebells", "xyztrig"]).astype(
        jnp.float64)
    q = jnp.tile(q1, (10, 1, 1))[:nt]

    def build(**kw):
        base_kw = dict(filter="caas", limiter="caas", rho_isl=True, nsub=8,
                       geom_dtype="f32", interp_dtype="f32")
        base_kw.update(kw)
        return IslTransport(mesh, wind, IslConfig(ne=ne, np_=np_, **base_kw))

    base = build()
    n, kinds = kernel_count(base, rho, q, dt)
    print(f"ENTRY ops: {n}; kinds: {sorted(kinds.items(), key=lambda x: -x[1])[:12]}")
    t0 = tm_step(base, rho, q, dt)
    print(f"baseline step: {t0*1e3:.3f} ms")

    m1 = build(nsub=1)
    print(f"nsub=1 step:   {tm_step(m1, rho, q, dt)*1e3:.3f} ms")

    m2 = build()
    m2._dss_q = lambda r, qq, F=None: qq
    m2._step = jax.jit(m2._step_impl)
    print(f"no dss_q:      {tm_step(m2, rho, q, dt)*1e3:.3f} ms")

    m3 = build()
    m3._dss_q = lambda r, qq, F=None: qq
    m3._dss = lambda f, F=None: f
    m3._step = jax.jit(m3._step_impl)
    print(f"no dss at all: {tm_step(m3, rho, q, dt)*1e3:.3f} ms")

    m4 = build()
    fd = m4.face_dss
    fd._fix_q = lambda cg, qf, wff, Ff: cg
    m4._step = jax.jit(m4._step_impl)
    print(f"no fix_q:      {tm_step(m4, rho, q, dt)*1e3:.3f} ms")

    # departure stub: precomputed departure data as constants
    m5 = build()
    depdata = jax.jit(m5._departure_data)(0.0, dt)
    m5._departure_data = lambda ts, tf: depdata
    m5._step = jax.jit(m5._step_impl)
    print(f"no departure:  {tm_step(m5, rho, q, dt)*1e3:.3f} ms")

    # no limiter/CDR
    m6 = build(filter="none")
    print(f"filter none:   {tm_step(m6, rho, q, dt)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
