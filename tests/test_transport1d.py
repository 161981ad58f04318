"""1-D periodic semi-Lagrangian transport demo with CDR property
preservation - the end-to-end sanity fixture ported from
/root/reference/cedr/cedr_test_1d_transport.cpp: cubic-interpolation SL
advection on a periodic grid, with per-cell bounds from the interpolation
domain of dependence, run under QLT (shape-preserving), QLT (nonnegative)
and CAAS, checking mass conservation and bounds each step.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from compose_tpu.cdr import caas, qlt

EPS = np.finfo(np.float64).eps


def cubic_interp_periodic(y, x_dep):
    """Cubic Lagrange interpolation of samples y (on integer grid, periodic
    n) at departure coordinates x_dep (cedr_test_1d_transport.cpp,
    interp::cubic_interp_periodic)."""
    n = y.shape[0]
    i1 = np.floor(x_dep).astype(int)            # left-of-point node
    t = x_dep - i1
    idx = np.stack([(i1 - 1) % n, i1 % n, (i1 + 1) % n, (i1 + 2) % n])
    ys = y[idx]                                  # (4, n)
    # Lagrange weights on nodes -1, 0, 1, 2.
    w0 = -t * (t - 1) * (t - 2) / 6
    w1 = (t + 1) * (t - 1) * (t - 2) / 2
    w2 = -(t + 1) * t * (t - 2) / 2
    w3 = (t + 1) * t * (t - 1) / 6
    out = w0 * ys[0] + w1 * ys[1] + w2 * ys[2] + w3 * ys[3]
    lo = np.minimum(ys[1], ys[2])
    hi = np.maximum(ys[1], ys[2])
    return out, lo, hi


@pytest.mark.parametrize("method", ["qlt_shape", "qlt_nonneg", "caas"])
def test_transport1d(method):
    n = 111
    nsteps = 150
    u = 0.8                                  # CFL in cells/step
    x = np.arange(n, dtype=float)
    q0 = np.where(np.abs(x - n / 3) < n / 10, 1.0, 0.1)  # slotted-ish
    q0 += 0.5 * np.exp(-((x - 2 * n / 3) / (n / 15)) ** 2)
    rho = np.ones(n)

    if method == "qlt_shape":
        solver = qlt.QLT(n, problem_type=(
            qlt.SHAPEPRESERVE | qlt.CONSERVE | qlt.CONSISTENT))
    elif method == "qlt_nonneg":
        solver = qlt.QLT(n, problem_type=qlt.NONNEGATIVE | qlt.CONSERVE)
    else:
        solver = None

    q = q0.copy()
    mass0 = q.sum()
    gmin, gmax = q0.min(), q0.max()
    for _ in range(nsteps):
        x_dep = x - u
        q_new, lo, hi = cubic_interp_periodic(q, x_dep)
        Qm = jnp.asarray(q_new[None])
        Qm_min = jnp.asarray(lo[None])
        Qm_max = jnp.asarray(hi[None])
        Qm_prev = jnp.asarray(q[None])
        if method == "caas":
            out = caas.run(Qm, Qm_min, Qm_max, Qm_prev=Qm_prev)
        else:
            out = solver.run(jnp.asarray(rho), Qm, Qm_min, Qm_max, Qm_prev)
        q = np.asarray(out[0])
        # Mass conservation every step (battery tolerance, 1e2*eps).
        assert abs(q.sum() - mass0) / abs(mass0) < 1e2 * EPS * nsteps
        if method != "qlt_nonneg":
            # Domain-of-dependence bounds imply global range preservation.
            assert q.min() >= gmin - 1e-12
            assert q.max() <= gmax + 1e-12
        else:
            assert q.min() >= -3 * EPS
    # The profile should still resemble the IC (gross sanity).
    shift = int(round(u * nsteps)) % n
    ref = np.roll(q0, shift)
    l2 = np.sqrt(np.mean((q - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert l2 < 0.35, l2
