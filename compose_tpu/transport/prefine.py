"""P-refinement experiments: coarse (v) velocity/density grid + p-refined
fine (t) tracer grid.

Counterpart of /root/reference/methods/slmm/slmmir_p_refine.{hpp,cpp} and the
experiment branches of Remapper::isl (slmmir_remapper_isl.cpp:1526-1647),
driven by `slmmir -prefine {1,5}` (slmmir.cpp:106-115):

  exp 1 - the FINE grid is primary (ICs, diagnostics, toy chemistry);
          density is integrated on the np=4 v-grid (mimicking the dycore)
          and interpolated to the fine grid each step; tracers advect on
          the fine grid with departure points interpolated from the v-grid
          trajectories.
  exp 5 - the V grid is primary; fine-grid (rho, q) live as internal state:
          q is transferred v->t once at start, advected and property-
          preserved on t, then transferred t->v each step (element-local
          interpolation + cell-local mass-matching limiter,
          transfer_q_to_{t,v}_mesh, :738-762).

Key reference mechanics reproduced:
  - the coarse basis is GllOffsetNodal ("we want the coarse basis to be
    stable to handle rho", slmmir.cpp:1592), while coarse->fine
    interpolation uses the plain GLL basis (IslImpl ctor, :508-519);
  - fine-grid node Jacobians are the INTERPOLATED v-grid Jacobians, and the
    fine Homme mass weights use the fine basis's modified quadrature
    weights on them, so constant rho on v maps to constant rho on t
    (calc_pref_gll_quantities, slmmir_p_refine.cpp:129-139);
  - rho interpolation v->t multiplies by Jt_v, interpolates, divides by
    Jt_f - elementwise mass-density consistency in the Homme measure
    (IslImpl::interp_rho, :567-611);
  - q transfers are plain element-local interpolation followed by a
    cell-local limiter that restores the cell's tracer mass and source-grid
    bounds (IslImpl::limit_tracers, :697-736).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .. import basis as basis_mod
from ..mesh import cubed_sphere
from ..ops import sphere, sqr
from ..ops.reduce import bfb_sum
from . import dss, limiter as limiter_mod, spf, timeint


@dataclasses.dataclass(frozen=True)
class PRefineConfig:
    ne: int
    np_: int                       # fine-grid np
    basis: str = "GllNodal"
    filter: str = "caas"
    limiter: str = "caas"
    experiment: int = 5            # 1 | 5
    nsub: int = 8
    v_np: int = 4
    # Grid rotation spec ((axis), angle) - the v-grid MUST be built with
    # the same rotation as the fine grid (slmmir -rotate-grid rotates
    # geo_p before both grids are derived, slmmir.cpp:456-459).
    rotate: tuple = None
    # Mass measure (-dmc): 'es' conserves the spherical basis-function
    # integrals on both grids (the reference's prefine es rows assert
    # sphere-measure cv, slmm_runtests.py:152-153); anything else uses
    # the Homme/GLL-family weights.
    dmc: str = "f"


def _kron_eval(bas_from, x_nodes):
    """2-D tensor interpolation matrix: (np_to^2, np_from^2) evaluating the
    `bas_from` basis at the tensor grid of 1-D coords x_nodes
    (Interpolator2D, slmmir_p_refine.cpp:141-171)."""
    V = np.asarray(bas_from.eval(jnp.asarray(np.asarray(x_nodes))))
    return np.kron(V, V)  # [j_to*np_to + i_to, j_from*np_from + i_from]


class PRefineTransport:
    def __init__(self, mesh_f: cubed_sphere.CubedSphereMesh, wind,
                 config: PRefineConfig):
        assert config.experiment in (1, 5)
        assert mesh_f.np_ == config.np_
        self.config = config
        self.wind = wind
        self.mesh_f = mesh_f
        # Coarse grid: GLL nodes, stabilized GllOffsetNodal interpolant.
        self.mesh_v = cubed_sphere.build(config.ne, config.v_np,
                                         "GllOffsetNodal",
                                         rotate=config.rotate)
        mv, mf = self.mesh_v, mesh_f
        self.basis_v = basis_mod.create("GllOffsetNodal", config.v_np)
        self.basis_f = basis_mod.create(config.basis, config.np_)
        gll_v = basis_mod.GLL(config.v_np)

        # Interp operators (GLL basis coarse->fine; fine basis fine->coarse).
        self.C2F = jnp.asarray(_kron_eval(gll_v, mf.basis_x))
        self.F2C = jnp.asarray(_kron_eval(self.basis_f, gll_v.x))

        # Fine-grid mass quantities from interpolated v Jacobians
        # (calc_pref_gll_quantities).
        Jt_v = mv.jac_node                                   # (ncell, npv2)
        self.Jt_v = Jt_v
        self.Jt_f = jnp.einsum('fk,ck->cf', self.C2F, Jt_v)
        wf = np.asarray(self.basis_f.w)
        w2f = jnp.asarray(np.repeat(wf, config.np_) * np.tile(wf, config.np_))
        if config.dmc == "es":
            # Sphere measure on both grids: the CDR, the inter-grid
            # transfers, and the driver's cv check then all conserve the
            # same functional.
            self.F_f = mesh_f.dgbfi_sphere
            self.F_v = mv.dgbfi_sphere
        else:
            self.F_f = w2f[None, :] * self.Jt_f              # fine Homme mass
            self.F_v = mv.dgbfi_gll

        # Departure-point interpolation data for fine cgll nodes: owner
        # cell + GLL(np_v) weights at the fine node's ref coords (the
        # MeshInterpolator of IslImpl, :531-536).
        rep = np.asarray(mf.cgll_rep)
        own_cell = (rep // mf.np2).astype(np.int32)
        k = rep % mf.np2
        gx = np.asarray(mf.basis_x)
        a = jnp.asarray(gx[k % mf.np_])
        b = jnp.asarray(gx[k // mf.np_])
        va = gll_v.eval(a)                                   # (cnn_f, np_v)
        vb = gll_v.eval(b)
        self.vw_f = (vb[:, :, None] * va[:, None, :]).reshape(
            mf.cnn, config.v_np ** 2)
        self.own_cell_f = jnp.asarray(own_cell)

        # Isoparametric-Jacobian derivative matrix on the v grid (plain GLL
        # derivatives, slmmir_remapper_isl.cpp:178-183).
        self.D_v = gll_v.eval_deriv(gll_v.x)

        self.d2c_v = mv.dgll2cgll.reshape(-1)
        self.d2c_f = mf.dgll2cgll.reshape(-1)

        if config.filter in ("none", "caas-node"):
            # caas-node is global-only (glbl_only_pve / glbl_only_lcldyn,
            # slmmir_remapper_isl.cpp:366-445): no MassRedistributor.
            self.mrd_v = self.mrd_f = None
        else:
            self.mrd_v = spf.MassRedistributor(mv.ncell, config.filter)
            self.mrd_f = spf.MassRedistributor(mf.ncell, config.filter)
        self.run_cdr = config.filter != "none"

        self._step5 = jax.jit(self._step5_impl)
        self._step1 = jax.jit(self._step1_impl)

    # -- shared pieces ---------------------------------------------------
    def _departure(self, ts, tf):
        """Backward departure data on both grids from ONE v-grid trajectory
        integration."""
        mv, mf = self.mesh_v, self.mesh_f
        cfg = self.config
        vdep = timeint.integrate(self.wind.velocity, tf, ts, mv.cgll_xyz,
                                 cfg.nsub)
        ci_v, a0, b0 = cubed_sphere.get_cell_coords(mv.ne, vdep, mv.rot_R)
        av, bv = sqr.sphere_to_ref(mv.corners[ci_v], vdep, max_its=4,
                                   a0=a0, b0=b0)
        ea = self.basis_v.eval(av)
        eb = self.basis_v.eval(bv)
        w_v = (eb[:, :, None] * ea[:, None, :]).reshape(mv.cnn, mv.np2)

        vdep_cells = vdep[mv.dgll2cgll]                # (ncell, npv2, 3)
        dep_f = jnp.einsum('ck,ckd->cd', self.vw_f,
                           vdep_cells[self.own_cell_f])
        dep_f = sphere.normalize(dep_f)
        ci_f, a0, b0 = cubed_sphere.get_cell_coords(mf.ne, dep_f, mf.rot_R)
        af, bf = sqr.sphere_to_ref(mf.corners[ci_f], dep_f, max_its=4,
                                   a0=a0, b0=b0)
        fa = self.basis_f.eval(af)
        fb = self.basis_f.eval(bf)
        w_f = (fb[:, :, None] * fa[:, None, :]).reshape(mf.cnn, mf.np2)
        return (vdep, ci_v, w_v), (ci_f, w_f)

    def _transport_rho_v(self, rho_v, vdep, ci_v, w_v):
        """ISL density transport + CDR + DSS on the v grid (the 'mimic
        dycore' leg, slmmir_remapper_isl.cpp:1548-1561)."""
        mv = self.mesh_v
        cfg = self.config
        src = rho_v[ci_v, :]
        rho_i = jnp.einsum('cx,cx->c', src, w_v)
        pc = vdep[mv.dgll2cgll].reshape(mv.ncell, mv.np_, mv.np_, 3)
        D = self.D_v
        fa = jnp.einsum('ti,cjid->cjtd', D, pc)
        fb = jnp.einsum('tj,cjid->ctid', D, pc)
        f = pc
        r2 = sphere.norm2(f)[..., None]
        r = jnp.sqrt(r2)
        ua = (fa - f * (sphere.dot(f, fa)[..., None] / r2)) / r
        ub = (fb - f * (sphere.dot(f, fb)[..., None] / r2)) / r
        Jdep = sphere.norm(sphere.cross(ua, ub)).reshape(mv.ncell, mv.np2)
        ratio = Jdep / mv.jac_node
        rho_tgt = ratio * rho_i[self.d2c_v].reshape(mv.ncell, mv.np2)

        F = self.F_v
        Ff = F.reshape(-1)
        if self.run_cdr and self.mrd_v is None:
            # caas-node: uniform global mass restoration (glbl_only_pve,
            # slmmir_remapper_isl.cpp:366-387 via isl_cdr_rho :1259).
            mass_src = bfb_sum(Ff * rho_v.reshape(-1))
            mass_tgt = bfb_sum(Ff * rho_tgt.reshape(-1))
            rho_tgt = rho_tgt + (mass_src - mass_tgt) / bfb_sum(Ff)
        elif self.mrd_v is not None:
            mass_src = bfb_sum(Ff * rho_v.reshape(-1))
            mass_tgt = bfb_sum(Ff * rho_tgt.reshape(-1))
            rho_mass, R_min, R_mass, R_max = spf.record(
                F, rho_tgt, rho_tgt,
                jnp.zeros_like(rho_tgt), jnp.full_like(rho_tgt, 2.0))
            redist = self.mrd_v.redistribute(
                rho_mass, R_min, R_mass, R_max, mass_src - mass_tgt)
            rho_tgt = limiter_mod.limit_density(F, rho_tgt, redist - R_mass)
        flat = rho_tgt.reshape(-1)
        mv_ = self.mesh_v
        out = dss.dss_gather(flat, self.d2c_v, mv_.c2d_idx, mv_.c2d_mask, Ff)
        return out.reshape(mv.ncell, mv.np2)

    def _interp_rho(self, rho_v):
        """v -> fine density (Homme-mass form: interpolate rho*J, divide by
        the interpolated J; IslImpl::interp_rho, :580-589)."""
        x = rho_v * self.Jt_v
        return jnp.einsum('fk,ck->cf', self.C2F, x) / self.Jt_f

    def _transfer_q(self, op, F_from, rho_from, q_from, F_to, rho_to,
                    run_limit):
        """Element-local q interpolation + cell-local mass/bounds limiter
        (transfer_q_to_{t,v}_mesh + limit_tracers, :697-762).
        q_from: (nt, ncell, np2_from)."""
        q_to = jnp.einsum('fk,nck->ncf', op, q_from)
        if not run_limit:
            return q_to
        Q_to = q_to * rho_to[None]
        Qm_to = jnp.sum(F_to[None] * Q_to, axis=-1)          # (nt, ncell)
        Qm_from = jnp.sum(F_from[None] * rho_from[None] * q_from, axis=-1)
        q_min = jnp.min(q_from, axis=-1)[..., None]
        q_max = jnp.max(q_from, axis=-1)[..., None]
        np2_to = q_to.shape[-1]
        qmin_n = jnp.broadcast_to(q_min, Q_to.shape)
        qmax_n = jnp.broadcast_to(q_max, Q_to.shape)
        lim = jax.vmap(
            lambda Qi, qmin, qmax, di: limiter_mod.limit_tracer(
                F_to, rho_to, Qi, qmin, qmax, di,
                limiter=self.config.limiter
                if self.config.limiter != "none" else "caas"))
        Q_lim = lim(Q_to, qmin_n, qmax_n, Qm_from - Qm_to)
        return Q_lim / jnp.where(rho_to == 0, 1.0, rho_to)[None]

    def _advect_cdr_fine(self, rho_f_src, q_f, rho_f_tgt, ci_f, w_f):
        """Fine-grid tracer advection + CDR (global + cell-local), the
        isl_cdr leg on the t mesh (:1621-1637). No DSS afterwards
        (continuity need not hold on the internal fine grid, :1638-1639)."""
        mf = self.mesh_f
        cfg = self.config
        src = q_f[:, ci_f, :]
        q_i = jnp.einsum('ncx,cx->nc', src, w_f)
        q_tgt = q_i[:, self.d2c_f].reshape(q_f.shape[0], mf.ncell, mf.np2)

        if not self.run_cdr:
            return q_tgt
        F = self.F_f
        Ff = F.reshape(-1)
        nt = q_f.shape[0]
        Q_tgt = q_tgt * rho_f_tgt[None]
        Qm_src = bfb_sum(Ff[None] * (q_f * rho_f_src[None]).reshape(nt, -1),
                         axis=-1)
        Qm_tgt = bfb_sum(Ff[None] * Q_tgt.reshape(nt, -1), axis=-1)
        q_min_cell = jnp.min(q_f, axis=-1)
        q_max_cell = jnp.max(q_f, axis=-1)
        node_src_cell = ci_f[self.d2c_f].reshape(mf.ncell, mf.np2)
        q_min_node = q_min_cell[:, node_src_cell]
        q_max_node = q_max_cell[:, node_src_cell]

        if self.mrd_f is None:
            # caas-node: node-granularity global-only CAAS on the fine
            # grid (glbl_only_lcldyn, slmmir_remapper_isl.cpp:389-445 via
            # the prefine isl_cdr leg :1628-1632) - the relaxed-bounds
            # cell-local prefilter, then clip each node's tracer mass to
            # its strict source bounds and distribute the global
            # discrepancy proportionally to remaining nodal headroom.
            from ..ops import local_qp
            if cfg.limiter != "none":
                rel = 1e-2 * (q_max_node - q_min_node)
                lim = jax.vmap(
                    lambda Qi, qmin, qmax: limiter_mod.limit_tracer(
                        F, rho_f_tgt, Qi, qmin, qmax,
                        jnp.zeros(Qi.shape[0], Qi.dtype),
                        limiter=cfg.limiter, expand_bounds_allowed=True))
                Q_tgt = lim(Q_tgt, q_min_node - rel, q_max_node + rel)
            lo = (q_min_node * rho_f_tgt[None]).reshape(nt, -1)
            hi = (q_max_node * rho_f_tgt[None]).reshape(nt, -1)
            aF = jnp.broadcast_to(Ff[None], lo.shape)
            Qf = local_qp.caas_gsum(aF, Qm_src, lo, hi,
                                    Q_tgt.reshape(nt, -1), gsum=bfb_sum)
            Q_tgt = Qf.reshape(Q_tgt.shape)
            rho_safe = jnp.where(rho_f_tgt == 0, 1.0, rho_f_tgt)
            q_new = jnp.where(rho_f_tgt[None] == 0, q_min_node,
                              Q_tgt / rho_safe[None])
            return jnp.clip(q_new, q_min_node, q_max_node)

        rhom = F[None] * rho_f_tgt[None]
        Qc_min = jnp.sum(rhom * q_min_node, axis=-1)
        Qc_max = jnp.sum(rhom * q_max_node, axis=-1)
        Qc_mass = jnp.sum(F[None] * Q_tgt, axis=-1)
        redist = self.mrd_f.redistribute(
            jnp.sum(F * rho_f_tgt, axis=-1), Qc_min, Qc_mass, Qc_max,
            Qm_src - Qm_tgt)
        delta = redist - Qc_mass
        if cfg.limiter != "none":
            lim = jax.vmap(
                lambda Qi, qmin, qmax, di: limiter_mod.limit_tracer(
                    F, rho_f_tgt, Qi, qmin, qmax, di, limiter=cfg.limiter))
            Q_tgt = lim(Q_tgt, q_min_node, q_max_node, delta)
        rho_safe = jnp.where(rho_f_tgt == 0, 1.0, rho_f_tgt)
        q_new = jnp.where(rho_f_tgt[None] == 0, q_min_node,
                          Q_tgt / rho_safe[None])
        return jnp.clip(q_new, q_min_node, q_max_node)

    # -- experiment 5: v-grid primary -------------------------------------
    def _step5_impl(self, rho_v, q_v, rho_f, q_f, ts, tf, first):
        run_limit = self.run_cdr
        (vdep, ci_v, w_v), (ci_f, w_f) = self._departure(ts, tf)
        rho_v_tgt = self._transport_rho_v(rho_v, vdep, ci_v, w_v)

        def init_fine(_):
            rf = self._interp_rho(rho_v)
            qf = self._transfer_q(self.C2F, self.F_v, rho_v, q_v,
                                  self.F_f, rf, run_limit)
            return rf, qf
        rho_f_src, q_f_src = jax.lax.cond(
            first, init_fine, lambda _: (rho_f, q_f), None)

        rho_f_tgt = self._interp_rho(rho_v_tgt)
        q_f_tgt = self._advect_cdr_fine(rho_f_src, q_f_src, rho_f_tgt,
                                        ci_f, w_f)
        q_v_tgt = self._transfer_q(self.F2C, self.F_f, rho_f_tgt, q_f_tgt,
                                   self.F_v, rho_v_tgt, run_limit)
        return rho_v_tgt, q_v_tgt, rho_f_tgt, q_f_tgt

    # -- experiment 1: fine grid primary ----------------------------------
    def _step1_impl(self, rho_f, q_f, rho_v, ts, tf):
        (vdep, ci_v, w_v), (ci_f, w_f) = self._departure(ts, tf)
        rho_v_tgt = self._transport_rho_v(rho_v, vdep, ci_v, w_v)
        rho_f_src = self._interp_rho(rho_v)
        rho_f_tgt = self._interp_rho(rho_v_tgt)
        q_f_tgt = self._advect_cdr_fine(rho_f_src, q_f, rho_f_tgt,
                                        ci_f, w_f)
        return rho_f_tgt, q_f_tgt, rho_v_tgt

    # -- public API --------------------------------------------------------
    def step(self, rho, q, ts, tf, state=None):
        """Advance one step. exp 5: (rho, q) live on the v grid and `state`
        carries the internal fine-grid (rho_f, q_f); exp 1: (rho, q) live
        on the fine grid and `state` carries the v-grid density. Returns
        (rho', q', state')."""
        if self.config.experiment == 5:
            if state is None:
                mf = self.mesh_f
                state = (jnp.zeros((mf.ncell, mf.np2)),
                         jnp.zeros(q.shape[:1] + (mf.ncell, mf.np2)),
                         True)
            rho_f, q_f, first = state
            rho_v, q_v, rho_f, q_f = self._step5(rho, q, rho_f, q_f,
                                                 ts, tf, first)
            return rho_v, q_v, (rho_f, q_f, False)
        if state is None:
            state = jnp.ones((self.mesh_v.ncell, self.mesh_v.np2))
        rho_f, q_f, rho_v = self._step1(rho, q, state, ts, tf)
        return rho_f, q_f, rho_v
