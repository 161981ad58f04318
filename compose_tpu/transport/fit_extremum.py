"""Quadratic sub-grid extremum reconstruction (-fitext).

Counterpart of /root/reference/methods/slmm/slmm_fit_extremum.{hpp,cpp}: fit
a biquadratic m(x,y) (9 terms) and per-edge 1-D quadratics to the cell's
nodal values by L2 projection; when the fits are good (relative error below
np-scaled thresholds), locate their critical points and use the extremal
values to RELAX the cell's q bounds - recovering legitimate sub-grid extrema
that nodal min/max miss. Vectorized over all cells; fixed 5-step Newton for
the interior critical point.

(The reference's 2-D rel-err computation subtracts coef[2] (the x*y^2
coefficient); we subtract coef[8], the constant term, which is the evident
intent - remove the mean before measuring relative error.)
"""

import numpy as np
import jax.numpy as jnp

from .. import basis as basis_mod

_MAX_RELERR_1D_NP6 = 0.025
_MAX_RELERR_2D_NP6 = 0.025


def _eval_2d_basis(k, x, y):
    return [x * x * y * y, x * x * y, x * y * y, x * x, x * y, y * y,
            x, y, np.ones_like(x)][k]


class FitExtremum:
    def __init__(self, np_: int):
        self.np_ = np_
        self.max_relerr_1d = (np_ / 6.0) * _MAX_RELERR_1D_NP6
        self.max_relerr_2d = (np_ * np_ / 36.0) * _MAX_RELERR_2D_NP6
        gll = basis_mod.GLL(np_)
        gx = np.asarray(gll.x)
        gw = np.asarray(gll.w)
        self.gx, self.gw = jnp.asarray(gx), jnp.asarray(gw)

        # 2-D projection matrices over [-1,1]^2 (Gauss product rule, exact).
        qx, qw = np.polynomial.legendre.leggauss(np_ + 4)
        X, Y = np.meshgrid(qx, qx, indexing="ij")
        W = np.outer(qw, qw)
        B = np.stack([_eval_2d_basis(k, X, Y) for k in range(9)])  # (9,ng,ng)
        Mtgt = np.einsum('aij,bij,ij->ab', B, B, W)
        import jax.numpy as _j
        gl = np.asarray(basis_mod._lagrange_eval(gll.x, _j.asarray(qx)))
        # GLL node c = i*np + j carries phi_j(x) phi_i(y); with the 'ij'
        # meshgrid convention X[a,b] = qx[a], Y[a,b] = qx[b]:
        phi = np.zeros((np_ * np_, len(qx), len(qx)))
        for i in range(np_):
            for j in range(np_):
                phi[i * np_ + j] = gl[:, j][:, None] * gl[:, i][None, :]
        Mmix = np.einsum('aij,cij,ij->ac', B, phi, W)  # (9, np2)
        self.P2 = jnp.asarray(np.linalg.solve(Mtgt, Mmix))  # coef = P2 @ y

        # 1-D projection (quadratic) via 12-point GLL quadrature like the
        # reference (slmm_fit_extremum.cpp:144-161).
        q1x, q1w = np.asarray(basis_mod.gll_nodes_weights(12))
        g1 = np.asarray(basis_mod._lagrange_eval(gll.x, _j.asarray(q1x)))
        B1 = np.stack([q1x ** 2, q1x, np.ones_like(q1x)])      # (3, nq)
        Mt1 = np.einsum('aq,bq,q->ab', B1, B1, q1w)
        Mm1 = np.einsum('aq,qc,q->ac', B1, g1, q1w)            # (3, np)
        self.P1 = jnp.asarray(np.linalg.solve(Mt1, Mm1))

    # ------------------------------------------------------------------
    def _eval2(self, c, x, y):
        x2, y2 = x * x, y * y
        return (c[..., 0] * x2 * y2 + c[..., 1] * x2 * y
                + c[..., 2] * x * y2 + c[..., 3] * x2 + c[..., 4] * x * y
                + c[..., 5] * y2 + c[..., 6] * x + c[..., 7] * y
                + c[..., 8])

    def calc(self, y_gll):
        """y_gll: (..., np2) nodal values. Returns (min, max, use) with
        shapes (...,)."""
        np_ = self.np_
        shape = y_gll.shape[:-1]
        yv = y_gll.reshape(shape + (np_, np_))  # [i(y), j(x)]

        # ---- 1-D edge fits (4 edges; slmm_fit_extremum.cpp:188-216).
        edges = jnp.stack([
            yv[..., :, np_ - 1],   # dir 0: x = +1 edge, varying y
            yv[..., np_ - 1, :],   # dir 1: y = +1
            yv[..., :, 0],         # dir 2: x = -1
            yv[..., 0, :],         # dir 3: y = -1
        ], axis=-2)                                  # (..., 4, np)
        c1 = jnp.einsum('ac,...dc->...da', self.P1, edges)  # (...,4,3)
        a, b, c0 = c1[..., 0], c1[..., 1], c1[..., 2]
        # Fit quality per edge.
        fit_vals = (a[..., None] * self.gx ** 2 + b[..., None] * self.gx
                    + c0[..., None])
        g = edges - c0[..., None]
        f = fit_vals - c0[..., None]
        num = jnp.sum(self.gw * (f - g) ** 2, -1)
        den = jnp.sum(self.gw * g * g, -1)
        relerr1 = jnp.sqrt(num / jnp.where(den == 0, 1.0, den))
        relerr1 = jnp.where(den == 0, 0.0, relerr1)
        xstar = -b / jnp.where(a == 0, 1.0, 2 * a)
        ok1 = ((relerr1 <= self.max_relerr_1d) & (a != 0)
               & (jnp.abs(xstar) <= 1.0))
        v1 = (a * xstar + b) * xstar + c0
        big = jnp.inf
        min1 = jnp.min(jnp.where(ok1, v1, big), -1)
        max1 = jnp.max(jnp.where(ok1, v1, -big), -1)
        use1 = jnp.any(ok1, -1)

        # ---- 2-D fit.
        c2 = jnp.einsum('ac,...c->...a', self.P2, y_gll)     # (..., 9)
        X = self.gx[None, :] * jnp.ones((np_, 1))            # [i(y), j(x)]
        Y = self.gx[:, None] * jnp.ones((1, np_))
        fit2 = self._eval2(c2[..., None, None, :], X, Y)
        g2 = yv - c2[..., 8][..., None, None]
        f2 = fit2 - c2[..., 8][..., None, None]
        num2 = jnp.sum(self.gw[:, None] * (f2 - g2) ** 2, (-2, -1))
        den2 = jnp.sum(self.gw[:, None] * g2 * g2, (-2, -1))
        relerr2 = jnp.sqrt(num2 / jnp.where(den2 == 0, 1.0, den2))
        relerr2 = jnp.where(den2 == 0, 0.0, relerr2)
        ok2 = relerr2 <= self.max_relerr_2d

        # All-fits-bounded gate (calc_extrema, :343-350).
        bounded = (jnp.all(relerr1 <= self.max_relerr_1d, -1)
                   & (relerr2 <= self.max_relerr_2d))

        # Interior critical point: 5 Newton steps on grad m = 0 (:287-305).
        x = jnp.zeros(shape)
        y = jnp.zeros(shape)
        cc = c2
        for _ in range(5):
            gx_ = (2 * (cc[..., 0] * y * y + cc[..., 1] * y + cc[..., 3]) * x
                   + (cc[..., 2] * y * y + cc[..., 4] * y + cc[..., 6]))
            gy_ = (2 * (cc[..., 0] * x * x + cc[..., 2] * x + cc[..., 5]) * y
                   + (cc[..., 1] * x * x + cc[..., 4] * x + cc[..., 7]))
            H0 = 2 * (cc[..., 0] * y * y + cc[..., 1] * y + cc[..., 3])
            H1 = (4 * cc[..., 0] * x * y + 2 * (cc[..., 1] * x
                                                + cc[..., 2] * y)
                  + cc[..., 4])
            H2 = 2 * (cc[..., 0] * x * x + cc[..., 2] * x + cc[..., 5])
            det = H0 * H2 - H1 * H1
            det_s = jnp.where(det == 0, 1.0, det)
            x = jnp.where(det == 0, 2.0, x + (-H2 * gx_ + H1 * gy_) / det_s)
            y = jnp.where(det == 0, 2.0, y + (H1 * gx_ - H0 * gy_) / det_s)
        inb = (jnp.abs(x) <= 1.0) & (jnp.abs(y) <= 1.0)
        use2 = ok2 & inb
        v2 = self._eval2(c2, x, y)

        mn = jnp.where(use1, min1, big)
        mn = jnp.where(use2, jnp.minimum(mn, v2), mn)
        mx = jnp.where(use1, max1, -big)
        mx = jnp.where(use2, jnp.maximum(mx, v2), mx)
        use = bounded & (use1 | use2)
        mn = jnp.where(use, mn, 0.0)
        mx = jnp.where(use, mx, 0.0)
        return mn, mx, use
