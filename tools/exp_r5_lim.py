"""Prototype: CDR records + cell-local CAAS limiter in plain-XLA df64
(f32 pairs) vs the current f64 path, timed on TPU."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from compose_tpu.ops import df64, local_qp


def tm(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def caas_dd(a, b, xlo, xhi, y):
    """df64 cell-local CAAS over the last axis; all args (hi, lo) pairs.
    a,xlo,xhi,y: (..., n) pairs; b: (...,) pair."""
    x = df64.clip(y, xlo, xhi)
    ax = df64.mul(a, x)
    s = (jnp.sum(ax[0], axis=-1), jnp.sum(ax[1], axis=-1))  # cheap pair sum
    # pairwise-exact sum would be better; test perf first
    dm = df64.sub(b, s)
    up = df64.gt_zero(dm)
    dhi = df64.sub(xhi, x)
    dlo = df64.sub(x, xlo)
    fh = df64.mul(a, dhi)
    fl = df64.mul(a, dlo)
    fac = df64.select(up[..., None] if up.ndim < fh[0].ndim else up,
                      (jnp.sum(fh[0], -1), jnp.sum(fh[1], -1)),
                      (jnp.sum(fl[0], -1), jnp.sum(fl[1], -1)))
    facpos = df64.gt_zero(fac)
    one = (jnp.ones_like(fac[0]), jnp.zeros_like(fac[0]))
    scale = df64.div(dm, df64.select(facpos, fac, one))
    scale = (jnp.where(facpos, scale[0], 0.0), jnp.where(facpos, scale[1], 0.0))
    dirn = df64.select(up[..., None], dhi, dlo)
    x = df64.add(x, df64.mul((scale[0][..., None], scale[1][..., None]), dirn))
    return df64.clip(x, xlo, xhi)


@jax.jit
def limiter_dd(F2, rho2, q_tgt32, qmin2, qmax2, b2):
    """F2,rho2: (ncell,np2) pairs; q_tgt32 f32 (nt,ncell,np2);
    qmin2/qmax2 (nt,ncell,np2) pairs; b2 (nt,ncell) pair."""
    rhom = df64.mul(F2, rho2)
    a = (rhom[0][None], rhom[1][None])
    y = df64.from_f32(q_tgt32)
    x = caas_dd(a, b2, qmin2, qmax2, y)
    zero = rho2[0] == 0
    q_new = df64.select(zero[None], qmin2, x)
    return q_new


@jax.jit
def records_dd(F2, rho2, q_tgt32, qmin2, qmax2):
    rhom = df64.mul(F2, rho2)
    a = (rhom[0][None], rhom[1][None])
    Qt = df64.mul_f32((F2[0][None], F2[1][None]),
                      q_tgt32 * rho2[0][None])  # q*rho exact? not quite
    Cmin = df64.mul(a, qmin2)
    Cmax = df64.mul(a, qmax2)
    return (jnp.sum(Qt[0], -1), jnp.sum(Qt[1], -1)), \
        (jnp.sum(Cmin[0], -1), jnp.sum(Cmin[1], -1)), \
        (jnp.sum(Cmax[0], -1), jnp.sum(Cmax[1], -1))


def main():
    nt, ncell, np2 = 40, 5400, 16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    F = jax.random.uniform(ks[0], (ncell, np2), jnp.float64, 1e-6, 2e-5)
    rho = jax.random.uniform(ks[1], (ncell, np2), jnp.float64, 0.2, 2.0)
    q32 = jax.random.uniform(ks[2], (nt, ncell, np2), jnp.float32)
    qt = q32.astype(jnp.float64)
    qmin = qt - jax.random.uniform(ks[3], qt.shape, jnp.float64, 0, 0.1)
    qmax = qt + jax.random.uniform(ks[4], qt.shape, jnp.float64, 0, 0.1)
    rhom = F * rho
    Qm_tot = jnp.sum(qt * rhom, -1) + jax.random.uniform(
        ks[5], (nt, ncell), jnp.float64, -1e-6, 1e-6)

    # current f64 path
    @jax.jit
    def f64_lim(F, rho, qt, qmin, qmax, b):
        rhom = F * rho
        a = jnp.maximum(rhom, 1e-300)[None]
        x = local_qp.clip_and_sum(a, b, qmin, qmax, qt)
        return jnp.where((rho == 0)[None], qmin, x)

    t_f64 = tm(f64_lim, F, rho, qt, qmin, qmax, Qm_tot)
    print(f"f64 limiter:  {t_f64*1e3:.3f} ms")

    F2 = df64.split_f64(F)
    rho2 = df64.split_f64(rho)
    qmin2 = df64.split_f64(qmin)
    qmax2 = df64.split_f64(qmax)
    b2 = df64.split_f64(Qm_tot)
    t_dd = tm(limiter_dd, F2, rho2, q32, qmin2, qmax2, b2)
    print(f"dd  limiter:  {t_dd*1e3:.3f} ms")

    out_dd = limiter_dd(F2, rho2, q32, qmin2, qmax2, b2)
    ref = f64_lim(F, rho, qt, qmin, qmax, Qm_tot)
    got = np.asarray(df64.join_f64(out_dd))
    d = np.abs(got - np.asarray(ref))
    print(f"dd-vs-f64 limiter: max abs {d.max():.3e}")

    # records timing
    @jax.jit
    def f64_rec(F, rho, qt, qmin, qmax):
        rhom = (F * rho)[None]
        return (jnp.sum(F[None] * (qt * rho[None]), -1),
                jnp.sum(rhom * qmin, -1), jnp.sum(rhom * qmax, -1))

    print(f"f64 records: {tm(f64_rec, F, rho, qt, qmin, qmax)*1e3:.3f} ms")
    print(f"dd records:  {tm(records_dd, F2, rho2, q32, qmin2, qmax2)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
