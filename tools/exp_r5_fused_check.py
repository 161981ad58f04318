"""Validate the fused df64 tracer-CDR path vs the f64 XLA path on TPU, then
time the step."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

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


def main():
    ne, np_, nt = 30, 4, 40
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    dt = 86400.0 * 12 / 120
    rho0 = jnp.ones((mesh.ncell, mesh.np2), jnp.float64)
    q1 = driver.init_tracers(mesh, ["gaussianhills", "slottedcylinders",
                                    "cosinebells", "xyztrig"]).astype(
        jnp.float64)
    q0 = jnp.tile(q1, (10, 1, 1))[:nt]
    cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                    rho_isl=True, nsub=8, geom_dtype="f32",
                    interp_dtype="f32")
    fused = IslTransport(mesh, wind, cfg)
    assert fused._fused_tracer_cdr_ok(), "fused gate should be on"
    ref = IslTransport(mesh, wind, cfg)
    ref.face_dss.pallas_enabled = False

    rf, qf = fused.step(rho0, q0, 0.0, dt)
    rr, qr = ref.step(rho0, q0, 0.0, dt)
    dq = np.abs(np.asarray(qf) - np.asarray(qr))
    rel = dq / np.maximum(np.abs(np.asarray(qr)), 1e-30)
    print(f"q fused-vs-ref: max abs {dq.max():.3e}  max rel {rel.max():.3e}")
    dr = np.abs(np.asarray(rf) - np.asarray(rr)).max()
    print(f"rho fused-vs-ref: max abs {dr:.3e}")

    # invariants over 10 fused steps: global mass + bounds
    F = np.asarray(fused.F)
    r, qq = rho0, q0
    m0 = None
    worst_bounds = 0.0
    for i in range(10):
        q_prev = np.asarray(qq)
        r2, qq2 = fused.step(r, qq, i * dt, (i + 1) * dt)
        w = F[None] * np.asarray(r2)[None]
        m = (w * np.asarray(qq2)).sum(axis=(1, 2))
        w_prev = F[None] * np.asarray(r)[None]
        m_prev = (w_prev * q_prev).sum(axis=(1, 2))
        drift = np.abs(m / m_prev - 1).max()
        lo = q_prev.min(axis=(1, 2))
        hi = q_prev.max(axis=(1, 2))
        v = np.maximum(np.asarray(qq2).max(axis=(1, 2)) - hi,
                       lo - np.asarray(qq2).min(axis=(1, 2)))
        worst_bounds = max(worst_bounds, float(np.maximum(v, 0).max()))
        if i == 0:
            print(f"step mass drift: {drift:.3e}")
        r, qq = r2, qq2
    print(f"worst global-bounds overshoot over 10 steps: {worst_bounds:.3e}")

    print(f"fused step: {tm_step(fused, rho0, q0, dt)*1e3:.3f} ms")
    print(f"ref step:   {tm_step(ref, rho0, q0, dt)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
