"""Bisect the in-step cost of the tracer-CDR region by patching pieces."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, gallery
from compose_tpu.ops import reduce as reduce_mod
from compose_tpu.transport import spf, limiter as limiter_mod


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
    rho = jnp.ones((mesh.ncell, mesh.np2), jnp.float64)
    q1 = driver.init_tracers(mesh, ["gaussianhills", "slottedcylinders",
                                    "cosinebells", "xyztrig"]).astype(
        jnp.float64)
    q = jnp.tile(q1, (10, 1, 1))[:nt]

    def build():
        cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                        rho_isl=True, nsub=8, geom_dtype="f32",
                        interp_dtype="f32")
        return IslTransport(mesh, wind, cfg)

    base = build()
    print(f"baseline:             {tm_step(base, rho, q, dt)*1e3:.3f} ms")

    # a) no redistribute: redist := Qc_mass (delta = 0), keep limiter
    m = build()
    class MrdStub:
        def redistribute(self, rho_mass, Qmin, Qmass, Qmax, extra):
            return Qmass
    m.mrd = MrdStub()
    m._step = jax.jit(m._step_impl)
    print(f"redist=identity:      {tm_step(m, rho, q, dt)*1e3:.3f} ms")

    # b) redistribute without BFB sums (plain jnp.sum global)
    m = build()
    class MrdPlain:
        def redistribute(self, rho_mass, Qmin, Qmass, Qmax, extra):
            return spf.glbl_caas_gsum(Qmin, Qmass, Qmax, extra,
                                      lambda x: jnp.sum(x, axis=-1))
    m.mrd = MrdPlain()
    m._step = jax.jit(m._step_impl)
    print(f"redist plain-sum:     {tm_step(m, rho, q, dt)*1e3:.3f} ms")

    # c) no limiter but keep redistribute alive (return delta-dependent q)
    m = build()
    def fake_limit(F, rho_t, Q, qmin, qmax, d, **kw):
        return jnp.clip(Q * (1.0 / jnp.where(rho_t == 0, 1.0, rho_t))
                        + 0.0 * d[..., None], qmin, qmax)
    orig = limiter_mod.limit_tracer
    limiter_mod.limit_tracer = fake_limit
    try:
        m._step = jax.jit(m._step_impl)
        print(f"limiter stub (redist kept): {tm_step(m, rho, q, dt)*1e3:.3f} ms")
    finally:
        limiter_mod.limit_tracer = orig

    # d) constant bounds (skip cell min/max + node bounds gather)
    m = build()
    real_impl = m._step_impl
    import compose_tpu.transport.isl as isl_mod
    # monkeypatch via config positive_only=True gives fixed [0,2] bounds and
    # the nonneg limit path - different code; instead patch fitext-free
    # bounds by hacking q min/max: easiest via jnp-level override is messy;
    # approximate by timing positive_only (different but indicative).
    cfgp = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                     rho_isl=True, nsub=8, geom_dtype="f32",
                     interp_dtype="f32", positive_only=True)
    mp = IslTransport(mesh, wind, cfgp)
    print(f"positive-only (fixed bounds): {tm_step(mp, rho, q, dt)*1e3:.3f} ms")

    # e) no bfb_sum_cells: replace with plain per-cell sum + plain global sum
    m = build()
    orig_bsc = reduce_mod.bfb_sum_cells
    orig_bs = reduce_mod.bfb_sum
    isl_mod2 = sys.modules["compose_tpu.transport.isl"]
    orig_isl_bsc = isl_mod2.bfb_sum_cells
    isl_mod2.bfb_sum_cells = lambda x: jnp.sum(
        x.reshape(x.shape[:-2] + (-1,)), axis=-1)
    try:
        m._step = jax.jit(m._step_impl)
        print(f"plain-sum masses:     {tm_step(m, rho, q, dt)*1e3:.3f} ms")
    finally:
        isl_mod2.bfb_sum_cells = orig_isl_bsc


if __name__ == "__main__":
    main()
