"""Physgrid: GLL <-> FV (nphys x nphys subcell) remaps for physics coupling.

Counterpart of /root/reference/methods/slmm/slmmir_physgrid.{hpp,cpp}
(pg::Gll2Fv, pg::IdemFv2Gll / L2Fv2Gll). Key pieces:

  - the mixed mass matrix M_dp of basis-function integrals over FV subcells
    (Basis::compute_integrals_over_subcells_2d). The 2-D integrals tensorize
    into 1-D per-axis integrals computed EXACTLY by piecewise Gauss
    quadrature split at the basis's sub-polynomial region boundaries (the
    islet bases are piecewise polynomial);
  - Gll2Fv: subcell averaging, p = M_dp' (J_gll d) / (M_pp J_fv)
    (slmmir_physgrid.cpp:120-129);
  - IdemFv2Gll: the idempotent reconstruction d = npi_to_np . M_dp^{-T}
    (M_pp p) (constrained projection, :270-311): remapping FV -> GLL -> FV
    returns the FV state exactly;
  - CAAS limiting of the remapped mixing ratio against caller bounds
    (pg::limit, :16-36).

All per-cell solves are precomputed into dense (np^2, nphys^2) operators at
setup; runtime remaps are one batched einsum per direction.
"""

import numpy as np
import jax.numpy as jnp

from .. import basis as basis_mod
from ..ops import local_qp


def _basis_region_breaks(bas):
    """1-D breakpoints where the basis is only piecewise polynomial."""
    xs = np.asarray(bas.x)
    return np.unique(np.concatenate([[-1.0], xs, [1.0]]))


def _basis_1d_integrals(bas, nphys: int):
    """I1[i, p] = integral of basis fn i over FV interval p of [-1, 1],
    exact via piecewise Gauss split at basis region breaks."""
    np_ = bas.np
    edges = np.linspace(-1.0, 1.0, nphys + 1)
    breaks = _basis_region_breaks(bas)
    gx, gw = np.polynomial.legendre.leggauss(np_ + 2)
    I1 = np.zeros((np_, nphys))
    for p in range(nphys):
        lo, hi = edges[p], edges[p + 1]
        pts = np.unique(np.clip(
            np.concatenate([[lo, hi], breaks[(breaks > lo) & (breaks < hi)]]),
            lo, hi))
        for a, b in zip(pts[:-1], pts[1:]):
            xm = 0.5 * (a + b) + 0.5 * (b - a) * gx
            wm = 0.5 * (b - a) * gw
            vals = np.asarray(bas.eval(jnp.asarray(xm)))   # (ng, np)
            I1[:, p] += (wm[:, None] * vals).sum(axis=0)
    return I1


def _mixed_mass_matrix(bas, nphys: int):
    """M_dp[(j*np+i), (py*nphys+px)] via the tensor factorization."""
    I1 = _basis_1d_integrals(bas, nphys)
    np_ = bas.np
    M = np.einsum('jq,ip->jiqp', I1, I1)   # [j, i, py, px]
    return M.reshape(np_ * np_, nphys * nphys)


def _interp_matrix(np_from: int, np_to: int):
    """Plain Lagrange interpolation matrix GLL np_from -> np_to nodes
    (build_interp_matrix, slmmir_physgrid.cpp:313-333)."""
    import jax.numpy as jnp
    fb = basis_mod.GLL(np_from)
    tb = basis_mod.GLL(np_to)
    v = np.asarray(basis_mod._lagrange_eval(fb.x, tb.x))   # (np_to, np_from)
    M = np.einsum('ia,jb->ijab', v, v).reshape(
        np_to * np_to, np_from * np_from)
    return M


class PhysgridOps:
    """Per-mesh physgrid operators (pg::PhysgridOps).

    gll_met: (ncell, np2) sphere Jacobian at GLL nodes (mesh.jac_node);
    fv_met: (ncell, nphys2) mean Jacobian over each FV subcell.
    """

    def __init__(self, mesh, nphys: int, fv2gll_type: str = "idem"):
        if fv2gll_type not in ("idem",):
            raise NotImplementedError(fv2gll_type)
        self.mesh = mesh
        self.nphys = nphys
        np_ = mesh.np_
        bas = basis_mod.create(mesh.basis_name, np_)
        self.M_dp = _mixed_mass_matrix(bas, nphys)         # (np2, nphys2)
        self.M_pp = np.full(nphys * nphys, (2.0 / nphys) ** 2)
        gw = np.asarray(basis_mod.GLL(np_).w)
        self.w_dd = np.outer(gw, gw).reshape(-1)

        # Idempotent FV->GLL operator: npi = nphys (>= 2), built on the
        # intermediate GLL basis, then interpolated to np.
        npi = max(2, nphys)
        g_npi = basis_mod.GLL(npi)
        M_dp_i = _mixed_mass_matrix(g_npi, nphys)          # (npi2, nphys2)
        if nphys >= 2:
            # Square solve: d_npi = M_dp^{-T} (M_pp p).
            inv = np.linalg.solve(M_dp_i.T, np.diag(self.M_pp))
        else:
            # nphys=1: least-norm reconstruction through npi=2.
            inv = np.linalg.pinv(M_dp_i.T) @ np.diag(self.M_pp)
        self.op_p_to_d = _interp_matrix(npi, np_) @ inv    # (np2, nphys2)

        # FV subcell mean Jacobians: integrate the corner-bilinear |J| over
        # each subcell (tensor Gauss; J is smooth).
        self.gll_met = jnp.asarray(mesh.jac_node)
        self.fv_met = jnp.asarray(self._fv_metdet())
        self.M_dp_j = jnp.asarray(self.M_dp)
        self.op_j = jnp.asarray(self.op_p_to_d)
        self.M_pp_j = jnp.asarray(self.M_pp)

    def _fv_metdet(self):
        from ..ops import sqr
        m = self.mesh
        nphys = self.nphys
        gx, gw = np.polynomial.legendre.leggauss(4)
        edges = np.linspace(-1.0, 1.0, nphys + 1)
        out = np.zeros((m.ncell, nphys * nphys))
        for py in range(nphys):
            for px in range(nphys):
                ax = 0.5 * (edges[px] + edges[px + 1])
                hx = 0.5 * (edges[px + 1] - edges[px])
                ay = 0.5 * (edges[py] + edges[py + 1])
                hy = 0.5 * (edges[py + 1] - edges[py])
                acc = 0.0
                for i in range(len(gx)):
                    for j in range(len(gx)):
                        J = sqr.bilinear_jacobian_norm(
                            m.corners, jnp.full((m.ncell,), ax + hx * gx[i]),
                            jnp.full((m.ncell,), ay + hy * gx[j]))
                        acc = acc + gw[i] * gw[j] * np.asarray(J)
                out[:, py * nphys + px] = acc / 4.0
        return out

    # ------------------------------------------------------------------
    def gll2fv(self, rho_d, q_d, limiter: str = "caas"):
        """(ncell, np2), (nt, ncell, np2) -> FV state (ncell, nphys2),
        (nt, ncell, nphys2) (Gll2Fv::remap, slmmir_physgrid.cpp:131-149)."""
        md = self.M_dp_j
        den = self.M_pp_j[None, :] * self.fv_met
        rho_p = jnp.einsum('dp,cd->cp', md, rho_d * self.gll_met) / den
        Q_p = jnp.einsum('dp,ncd->ncp', md,
                         (q_d * rho_d[None]) * self.gll_met[None]) / den[None]
        q_p = Q_p / rho_p[None]
        if limiter == "caas":
            qlo = jnp.min(q_d, axis=-1)
            qhi = jnp.max(q_d, axis=-1)
            a = den[None] * rho_p[None]
            b = jnp.sum(a * q_p, axis=-1)
            q_p = local_qp.caas(a, b, qlo[..., None], qhi[..., None], q_p)
        return rho_p, q_p

    def fv2gll(self, rho_p, q_p, qlo=None, qhi=None, limiter: str = "caas"):
        """FV state back to GLL (Fv2Gll::remap + IdemFv2Gll::remapd). qlo,
        qhi: (nt, ncell) mixing-ratio bounds (from neighbor FV cells);
        defaults to per-cell FV extrema."""
        op = self.op_j
        rho_d = jnp.einsum('dp,cp->cd', op, self.fv_met * rho_p) \
            / self.gll_met
        Q_d = jnp.einsum('dp,ncp->ncd', op,
                         (self.fv_met * rho_p)[None] * q_p) \
            / self.gll_met[None]
        q_d = Q_d / rho_d[None]
        if limiter == "caas" and self.nphys > 1:
            if qlo is None:
                qlo = jnp.min(q_p, axis=-1)
            if qhi is None:
                qhi = jnp.max(q_p, axis=-1)
            a = (self.w_dd[None, :] * self.gll_met)[None] * rho_d[None]
            b = jnp.sum(a * q_d, axis=-1)
            q_d = local_qp.caas(a, b, qlo[..., None], qhi[..., None], q_d)
        return rho_d, q_d
