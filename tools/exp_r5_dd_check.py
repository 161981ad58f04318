"""Validate + time the df64 Pallas dss_q kernel vs the XLA f64 roll path,
on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport.dss_face import FaceDss


def tm(fn, *args, iters=30):
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
    fd = FaceDss.build(mesh)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    rho = jax.random.uniform(k1, (mesh.ncell, mesh.np2),
                             jnp.float64, 0.2, 2.0)
    q = jax.random.uniform(k2, (nt, mesh.ncell, mesh.np2),
                           jnp.float64, 0.0, 1.0)
    # zero-density patch to exercise the fallback
    rho = rho.at[100:110].set(0.0)

    f_dd = jax.jit(fd.dss_q)
    out_dd = f_dd(rho, q)
    fd2 = FaceDss.build(mesh)
    fd2.pallas_enabled = False
    f_x = jax.jit(fd2.dss_q)
    out_x = f_x(rho, q)
    d = np.abs(np.asarray(out_dd) - np.asarray(out_x))
    rel = d / np.maximum(np.abs(np.asarray(out_x)), 1e-30)
    print(f"dss_q dd-vs-xla: max abs {d.max():.3e}  max rel {rel.max():.3e}")

    # invariants on the dd path: mass conservation in the F*rho measure
    w = np.asarray(fd.F)[None] * np.asarray(rho)[None]
    m_in = (w * np.asarray(q)).sum(axis=(1, 2))
    m_out = (w * np.asarray(out_dd)).sum(axis=(1, 2))
    print(f"mass rel drift (dd):  {np.abs(m_out/m_in - 1).max():.3e}")
    m_out_x = (w * np.asarray(out_x)).sum(axis=(1, 2))
    print(f"mass rel drift (xla): {np.abs(m_out_x/m_in - 1).max():.3e}")

    # single-field dss
    g_dd = jax.jit(fd.dss)
    g_x = jax.jit(fd2.dss)
    o1, o2 = np.asarray(g_dd(rho)), np.asarray(g_x(rho))
    print(f"dss(rho) dd-vs-xla: max abs {np.abs(o1-o2).max():.3e}")

    print(f"time dss_q dd:  {tm(f_dd, rho, q)*1e3:.3f} ms")
    print(f"time dss_q xla: {tm(f_x, rho, q)*1e3:.3f} ms")
    print(f"time dss dd:    {tm(g_dd, rho)*1e3:.3f} ms")
    print(f"time dss xla:   {tm(g_x, rho)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
