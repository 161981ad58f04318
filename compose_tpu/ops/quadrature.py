"""Triangle quadrature rules.

``get_coef(order)`` returns barycentric coordinates (nq, 3) and weights
(nq,) with sum(w) == 1, used as
integral ~= 0.5 * sum_q w_q * f(x_q) * J(x_q) - the reference accessor's
contract (/root/reference/siqk/siqk_quadrature.hpp:541-616).

For the orders the reference ships (4, 6, 8, 12, 14, 16, 18, 20) the
published cubature tables are used (ops/quadrature_tables.py - Dunavant /
Zhang-Cui-Liu / Taylor et al., incl. the order-12 Taylor rule the
reference selects because it "conserves one more digit",
siqk_quadrature.hpp:28-35). Those tables were produced with more care
about the last digits than any generic construction; using them recovers
the reference's clip-quadrature conservation digit (the round-3
cv-tolerance relaxations). Other orders fall back to a Duffy
(collapsed-coordinate) tensor-product Gauss-Legendre construction of the
requested exactness.
"""

import functools

import numpy as np

from . import quadrature_tables as _qt


@functools.lru_cache(maxsize=None)
def get_coef(order: int):
    """Return (bary, w): barycentric points (nq,3) and weights summing to 1.

    Exact (up to roundoff) for bivariate polynomials of total degree <= order.
    """
    if order in _qt.COORD:
        bary = np.asarray(_qt.COORD[order], dtype=np.float64).reshape(-1, 3)
        w = np.asarray(_qt.WEIGHT[order], dtype=np.float64)
        return bary, w
    # The Duffy map a1 = u, a2 = v (1 - u) has Jacobian (1 - u); a Gauss rule
    # with n points integrates degree 2n-1 per axis, and the extra (1 - u)
    # factor costs one degree, so n = ceil((order + 2) / 2) suffices.
    n = (order + 3) // 2
    xu, wu = np.polynomial.legendre.leggauss(n)
    # Map from [-1, 1] to [0, 1].
    xu = 0.5 * (xu + 1.0)
    wu = 0.5 * wu
    u = xu[:, None] * np.ones_like(xu)[None, :]
    v = np.ones_like(xu)[:, None] * xu[None, :]
    w = (wu[:, None] * wu[None, :]) * (1.0 - u)
    a1 = u
    a2 = v * (1.0 - u)
    a3 = 1.0 - a1 - a2
    bary = np.stack([a1.ravel(), a2.ravel(), a3.ravel()], axis=-1)
    w = 2.0 * w.ravel()  # normalize: sum(w) = 1
    return bary, w
