"""FitExtremum tests: recovers known sub-grid extrema of quadratic fields,
declines noisy/non-quadratic data."""

import numpy as np
import jax.numpy as jnp

from compose_tpu import basis as basis_mod
from compose_tpu.transport.fit_extremum import FitExtremum


def _nodal(np_, f):
    gx = np.asarray(basis_mod.gll_nodes_weights(np_)[0])
    X, Y = np.meshgrid(gx, gx, indexing="xy")   # [i(y), j(x)]
    return f(X, Y).reshape(-1)


def test_recovers_quadratic_interior_max():
    np_ = 4
    fe = FitExtremum(np_)
    # Paraboloid with max 1.3 at (0.2, -0.1) - off-node, so nodal max < 1.3.
    f = lambda X, Y: 1.3 - (X - 0.2) ** 2 - (Y + 0.1) ** 2
    y = _nodal(np_, f)
    assert y.max() < 1.3
    mn, mx, use = fe.calc(jnp.asarray(y[None]))
    assert bool(use[0])
    assert abs(float(mx[0]) - 1.3) < 1e-10
    # Min comes from an edge/corner fit; must not exceed the true min.
    assert float(mn[0]) >= f(*np.meshgrid(
        np.linspace(-1, 1, 101), np.linspace(-1, 1, 101))).min() - 1e-8


def test_edge_extremum():
    np_ = 4
    fe = FitExtremum(np_)
    # Quadratic ridge along the x=+1 edge peaking at y=0.3.
    f = lambda X, Y: 0.5 + 0.25 * X - (Y - 0.3) ** 2
    y = _nodal(np_, f)
    mn, mx, use = fe.calc(jnp.asarray(y[None]))
    assert bool(use[0])
    assert abs(float(mx[0]) - 0.75) < 1e-10  # at (1, 0.3)


def test_declines_rough_data():
    np_ = 4
    fe = FitExtremum(np_)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(np_ * np_)
    mn, mx, use = fe.calc(jnp.asarray(y[None]))
    assert not bool(use[0])


def test_batched():
    np_ = 4
    fe = FitExtremum(np_)
    f = lambda X, Y: 1.0 - X ** 2 - Y ** 2
    y = np.stack([_nodal(np_, f)] * 5)
    mn, mx, use = fe.calc(jnp.asarray(y))
    assert bool(jnp.all(use))
    assert np.allclose(np.asarray(mx), 1.0, atol=1e-10)
