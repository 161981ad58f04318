"""Physgrid: GLL <-> FV (nphys x nphys subcell) remaps for physics coupling.

Counterpart of /root/reference/methods/slmm/slmmir_physgrid.{hpp,cpp}
(pg::Gll2Fv, pg::{Idem,L2,L2ExceptPerim,ElemLclRecon}Fv2Gll). Key pieces:

  - the mixed mass matrix M_dp of basis-function integrals over FV subcells
    (Basis::compute_integrals_over_subcells_2d). The 2-D integrals tensorize
    into 1-D per-axis integrals computed EXACTLY by piecewise Gauss
    quadrature split at the basis's sub-polynomial region boundaries (the
    islet bases are piecewise polynomial);
  - Gll2Fv: subcell averaging, p = M_dp' (J_gll d) / (M_pp J_fv)
    (slmmir_physgrid.cpp:120-129);
  - Fv2Gll variants (Fv2Gll::Type, slmmir_physgrid.hpp:56-68):
      idem    - idempotent reconstruction d = npi_to_np . M_dp^{-T} (M_pp p)
                (:270-348): FV -> GLL -> FV returns the FV state exactly;
      l2      - L2 projection through the piecewise-linear hat basis on npi
                uniform nodes (UniformNodeReduced, slmm_basis_reduced.cpp):
                op = M_dd^{-1} M_ddi M_didi^{-1} M_pdi^T (:411-442);
      l2ep    - same, but the intermediate reconstruction is KKT-constrained
                to conserve the mass of every PERIMETER subcell plus total
                element mass (:460-538);
      elrecon - element-local panel reconstruction: each subcell's value
                function comes from an idempotent GLL(3)x(3-subcell-panel)
                reconstruction over its neighbors, then an L2 projection
                onto the np basis (:685-812). nphys <= 2 falls back to idem
                (the reference notes they coincide there);
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


class _Hat1D:
    """Piecewise-linear hat basis on np uniform nodes in [-1, 1]
    (UniformNodeReduced, slmm_basis_reduced.cpp: max_degree 1, region-wise
    linear interpolation between adjacent nodes)."""

    def __init__(self, np_: int):
        self.np = np_
        self.x = jnp.linspace(-1.0, 1.0, np_)

    def eval(self, x):
        xn = np.linspace(-1.0, 1.0, self.np)
        xx = np.asarray(x)
        v = np.zeros(xx.shape + (self.np,))
        h = xn[1] - xn[0]
        for i in range(self.np):
            v[..., i] = np.clip(1.0 - np.abs(xx - xn[i]) / h, 0.0, None)
        # Outside [-1,1]: linear extrapolation of the end segment (matches
        # region-wise Lagrange eval on the terminal region).
        lo = xx < xn[0]
        hi = xx > xn[-1]
        if np.any(lo):
            v[lo] = 0.0
            v[lo, 0] = (xn[1] - xx[lo]) / h
            v[lo, 1] = (xx[lo] - xn[0]) / h
        if np.any(hi):
            v[hi] = 0.0
            v[hi, -2] = (xn[-1] - xx[hi]) / h
            v[hi, -1] = (xx[hi] - xn[-2]) / h
        return jnp.asarray(v)


def _mass_matrix_1d(bas_a, bas_b):
    """M[i, j] = integral over [-1,1] of a_i b_j, exact piecewise Gauss with
    breaks from both bases (Basis::compute_mass_matrix_2d's 1-D factor)."""
    breaks = np.unique(np.concatenate(
        [_basis_region_breaks(bas_a), _basis_region_breaks(bas_b)]))
    deg = (bas_a.np + bas_b.np + 2)
    gx, gw = np.polynomial.legendre.leggauss(deg)
    M = np.zeros((bas_a.np, bas_b.np))
    for a, b in zip(breaks[:-1], breaks[1:]):
        xm = 0.5 * (a + b) + 0.5 * (b - a) * gx
        wm = 0.5 * (b - a) * gw
        va = np.asarray(bas_a.eval(jnp.asarray(xm)))
        vb = np.asarray(bas_b.eval(jnp.asarray(xm)))
        M += np.einsum('q,qi,qj->ij', wm, va, vb)
    return M


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


def _op_l2(bas, np_, nphys):
    """L2Fv2Gll::init_matrices (slmmir_physgrid.cpp:411-442):
    op = M_dd^{-1} M_ddi M_didi^{-1} M_pdi^T."""
    npi = max(2, nphys)
    hat = _Hat1D(npi)
    M_pdiT = _mixed_mass_matrix(hat, nphys)          # (npi2, nphys2)
    M1_hh = _mass_matrix_1d(hat, hat)
    M_didi = np.kron(M1_hh, M1_hh)
    M1_dh = _mass_matrix_1d(bas, hat)
    M_ddi = np.kron(M1_dh, M1_dh)                    # (np2, npi2)
    M1_dd = _mass_matrix_1d(bas, bas)
    M_dd = np.kron(M1_dd, M1_dd)
    return np.linalg.solve(M_dd, M_ddi @ np.linalg.solve(M_didi, M_pdiT))


def _op_l2ep(bas, np_, nphys):
    """L2ExceptPerimFv2Gll::init_matrices (slmmir_physgrid.cpp:460-538):
    the hat-basis reconstruction is constrained to conserve the mass of
    every perimeter subcell (plus total element mass when not fully
    constrained), then L2-projected to the np basis."""
    npi = max(2, nphys)
    nphys2 = nphys * nphys
    npi2 = npi * npi
    hat = _Hat1D(npi)
    M_pdiT = _mixed_mass_matrix(hat, nphys)          # (npi2, nphys2)
    M1_hh = _mass_matrix_1d(hat, hat)
    M_didi = np.kron(M1_hh, M1_hh)

    fully_constrained = nphys == 2
    mass_constraint = 0 if fully_constrained else 1
    perim = [i * nphys + j for i in range(nphys) for j in range(nphys)
             if i in (0, nphys - 1) or j in (0, nphys - 1)]
    ncon = len(perim) + mass_constraint
    Con = np.zeros((ncon, npi2))
    D = np.zeros((ncon, nphys2))
    for k, sc in enumerate(perim):
        Con[k] = M_pdiT[:, sc]
        D[k, sc] = 4.0 / nphys2
    if mass_constraint:
        # Hat-basis quadrature weights = trapezoid (UniformNodeReduced w_*).
        wts = np.full(npi, 2.0 / (npi - 1))
        wts[0] = wts[-1] = 1.0 / (npi - 1)
        Con[-1] = np.outer(wts, wts).reshape(-1)
        D[-1, :] = 4.0 / nphys2
    # KKT: [M_didi Con'; Con 0] [di; mu] = [M_pdi^T; D].
    K = np.zeros((npi2 + ncon, npi2 + ncon))
    K[:npi2, :npi2] = M_didi
    K[:npi2, npi2:] = Con.T
    K[npi2:, :npi2] = Con
    R = np.concatenate([M_pdiT, D], axis=0)
    CX = np.linalg.solve(K, R)[:npi2]                # (npi2, nphys2)

    M1_dh = _mass_matrix_1d(bas, hat)
    M_ddi = np.kron(M1_dh, M1_dh)
    M1_dd = _mass_matrix_1d(bas, bas)
    M_dd = np.kron(M1_dd, M1_dd)
    return np.linalg.solve(M_dd, M_ddi @ CX)


def _op_elrecon(bas, np_, nphys):
    """ElemLclReconFv2Gll::init_matrices (slmmir_physgrid.cpp:685-812).

    Each subcell (sci, scj) gets a panel: the 3 consecutive subcells around
    it per dimension, mapped onto [-1,1] in equal thirds, carrying an
    idempotent GLL(3)-on-3-subcells reconstruction of the neighboring FV
    values (edge_np = interior_np = 3). The resulting (discontinuous,
    per-subcell) reconstruction of each FV unit vector is L2-projected onto
    the np element basis. Requires nphys >= 3 (panels need 3 distinct
    neighbors); the reference notes elrecon == idem for nphys = 2."""
    nf = nphys
    nf2 = nf * nf
    np2 = np_ * np_
    # Panel operator: GLL(3) basis on [-1,1], 3 subcells (thirds); idem
    # reconstruction d_panel = M3^{-T} (A p_panel), A = subcell width 2/3.
    g3 = basis_mod.GLL(3)
    M3 = _mixed_mass_matrix(g3, 3)                   # (9, 9): [gll9, sub9]
    inv3 = np.linalg.solve(M3.T, np.eye(9) * (4.0 / 9.0))  # (9 gll, 9 sub)

    # 1-D panel geometry: element coord x in subcell j -> panel coord.
    edges = np.linspace(-1.0, 1.0, nf + 1)
    def panel_range(j):
        # Panel coordinate interval occupied by subcell j (Panel::set_coord).
        if j == 0:
            return (-1.0, -1.0 / 3.0)
        if j == nf - 1:
            return (1.0 / 3.0, 1.0)
        return (-1.0 / 3.0, 1.0 / 3.0)
    def neighbors(j):
        # Panel's 3 subcells along one dim (clamped window).
        if j == 0:
            return [0, 1, 2]
        if j == nf - 1:
            return [nf - 3, nf - 2, nf - 1]
        return [j - 1, j, j + 1]

    # Quadrature per (subcell x basis-region) piece.
    breaks = np.unique(np.concatenate(
        [_basis_region_breaks(bas), edges]))
    gx, gw = np.polynomial.legendre.leggauss(np_ + 6)

    # For every quadrature piece: element coords, panel coords, weights.
    M_mix = np.zeros((np2, nf2))
    # Precompute per-piece data along one dim (shared by x and y).
    pieces = []  # (subcell j, xs (ng,), ws (ng,), panel coords (ng,))
    for a, b in zip(breaks[:-1], breaks[1:]):
        mid = 0.5 * (a + b)
        j = min(nf - 1, max(0, int(nf * (mid + 1) / 2)))
        xs = 0.5 * (a + b) + 0.5 * (b - a) * gx
        ws = 0.5 * (b - a) * gw
        lo, hi = edges[j], edges[j + 1]
        plo, phi = panel_range(j)
        alpha = (xs - lo) / (hi - lo)
        xp = (1 - alpha) * plo + alpha * phi
        pieces.append((j, xs, ws, xp))

    vb_cache = [(j, np.asarray(bas.eval(jnp.asarray(xs))),
                 np.asarray(g3.eval(jnp.asarray(xp))), ws)
                for (j, xs, ws, xp) in pieces]

    for dof in range(nf2):
        ei = np.zeros(nf2)
        ei[dof] = 1.0
        # Panel coefficients for every subcell: (nf, nf, 9).
        coef = np.zeros((nf, nf, 9))
        for sci in range(nf):
            for scj in range(nf):
                pv = np.array([ei[i * nf + j]
                               for i in neighbors(sci)
                               for j in neighbors(scj)])
                coef[sci, scj] = inv3 @ pv
        # Integrate recon * np-basis over all (y-piece, x-piece) pairs.
        for (jy, vy, vy3, wy) in vb_cache:
            for (jx, vx, vx3, wx) in vb_cache:
                c = coef[jy, jx].reshape(3, 3)       # [panel_y, panel_x]
                f = np.einsum('qi,ij,rj->qr', vy3, c, vx3)  # (ngy, ngx)
                wqr = np.outer(wy, wx) * f
                # contrib[i(y-basis), j(x-basis)] matches the [j*np + i]
                # DOF layout used throughout.
                contrib = np.einsum('qr,qi,rj->ij', wqr, vy, vx)
                M_mix[:, dof] += contrib.reshape(-1)
    M1_dd = _mass_matrix_1d(bas, bas)
    M_dd = np.kron(M1_dd, M1_dd)
    return np.linalg.solve(M_dd, M_mix)


class PhysgridOps:
    """Per-mesh physgrid operators (pg::PhysgridOps).

    gll_met: (ncell, np2) sphere Jacobian at GLL nodes (mesh.jac_node);
    fv_met: (ncell, nphys2) mean Jacobian over each FV subcell.
    """

    def __init__(self, mesh, nphys: int, fv2gll_type: str = "idem"):
        if fv2gll_type not in ("idem", "l2", "l2ep", "elrecon"):
            raise NotImplementedError(fv2gll_type)
        self.mesh = mesh
        self.nphys = nphys
        self.fv2gll_type = fv2gll_type
        np_ = mesh.np_
        bas = basis_mod.create(mesh.basis_name, np_)
        self.M_dp = _mixed_mass_matrix(bas, nphys)         # (np2, nphys2)
        self.M_pp = np.full(nphys * nphys, (2.0 / nphys) ** 2)
        gw = np.asarray(basis_mod.GLL(np_).w)
        self.w_dd = np.outer(gw, gw).reshape(-1)

        if fv2gll_type == "l2":
            self.op_p_to_d = _op_l2(bas, np_, nphys)
        elif fv2gll_type == "l2ep":
            self.op_p_to_d = _op_l2ep(bas, np_, nphys)
        elif fv2gll_type == "elrecon" and nphys >= 3:
            self.op_p_to_d = _op_elrecon(bas, np_, nphys)
        else:
            # idem (and elrecon with nphys <= 2, where the two coincide):
            # npi = nphys (>= 2), built on the intermediate GLL basis, then
            # interpolated to np.
            npi = max(2, nphys)
            g_npi = basis_mod.GLL(npi)
            M_dp_i = _mixed_mass_matrix(g_npi, nphys)      # (npi2, nphys2)
            if nphys >= 2:
                # Square solve: d_npi = M_dp^{-T} (M_pp p).
                inv = np.linalg.solve(M_dp_i.T, np.diag(self.M_pp))
            else:
                # nphys=1: least-norm reconstruction through npi=2.
                inv = np.linalg.pinv(M_dp_i.T) @ np.diag(self.M_pp)
            self.op_p_to_d = _interp_matrix(npi, np_) @ inv  # (np2, nphys2)

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
