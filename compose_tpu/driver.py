"""End-to-end transport runs: the slmmir-equivalent driver.

Counterpart of /root/reference/methods/slmm/slmmir.cpp: set up mesh + wind +
ICs, run the time loop, accumulate Observer metrics, and report final error
norms / conservation / extrema exactly as the reference's `print_error` and
`<OL>` one-liner do (slmmir.cpp:355-440), so the reference's golden
thresholds (methods/slmm/slmm_runtests.py) apply directly.
"""

import dataclasses
import time

import numpy as np
import jax.numpy as jnp

from . import basis as basis_mod
from .mesh import cubed_sphere
from .ops import sphere
from .ops.reduce import bfb_sum
from .transport import dss, gallery
from .transport.isl import IslConfig, IslTransport
from . import constants


@dataclasses.dataclass
class RunOutput:
    """Final metrics, named as in the reference Output struct
    (slmmir.cpp:346-353)."""
    l2_err: float
    max_err: float
    l1_err: float
    mass_s: float
    mass_e: float
    mass_gll_s: float
    mass_gll_e: float
    min_s: float
    max_s: float
    min_e: float
    max_e: float
    et_timestep: float
    # Per-step internal checks (Observer::check, slmmir.cpp:921-958).
    max_step_mass_err: float
    max_step_bounds_err: float

    @property
    def cv(self):
        return _reldif(self.mass_s, self.mass_e)

    @property
    def cv_gll(self):
        return _reldif(self.mass_gll_s, self.mass_gll_e)

    def one_liner(self, **kv):
        parts = [f"<OL>"]
        for k, v in kv.items():
            parts.append(f"{k} {v}")
        parts += [
            f"re l2 {self.l2_err:9.3e} max {self.max_err:9.3e}",
            f"cv re {self.cv:9.3e}", f"cvgll re {self.cv_gll:9.3e}",
            f"mo min {self.min_s:9.3e} {self.min_e:9.3e} "
            f"{self.min_e - self.min_s:9.3e} "
            f"max {self.max_s:9.3e} {self.max_e:9.3e} "
            f"{self.max_e - self.max_s:9.3e}",
            f"et ts {self.et_timestep:9.3e}",
        ]
        return " ".join(parts)


def _reldif(a, b):
    return abs(b - a) / max(1.0, abs(a))


def init_tracers(mesh, ic_names):
    """Evaluate ICs at the CGLL nodes and inject to DGLL (slmmir.cpp:
    1121-1159)."""
    lat, lon = sphere.xyz2ll(mesh.cgll_xyz)
    qs = []
    for name in ic_names:
        u = gallery.initial_condition(name, lat, lon)
        qs.append(u[mesh.dgll2cgll.reshape(-1)].reshape(
            mesh.ncell, mesh.np2))
    return jnp.stack(qs)


def run(ne=10, np_=4, nsteps=12, T_days=12.0, ics=("gaussianhills",),
        ode="divergent", method="pisl", filter_="qlt", limiter="mn2",
        basis="GllNodal", nsub=8, dmc="none", lauritzen=False,
        observer_out=None, check_midpoint=False, geom_dtype="f64",
        fitext=False, rotate_grid=False, timeint="exact", perturb_rho=0.0,
        footprint=False, io_type=None, out_prefix="slmmir_out",
        write_every=1, vis_res=64, prefine=0, nonuni=False, pg=0,
        mesh_type="geometric", interp_dtype="f64", verbose=True,
        timers=False, tq=None, d2c=True):
    """One slmmir-style run; returns RunOutput.

    Defaults mirror the reference regression rows
    (slmm_runtests.py:113-128): 12 steps of the 12-day deformational flow.
    """
    # Positive-only filter spellings (-mono qlt-pve/caas-pve,
    # slmmir.hpp:144-169): only qlt-pve is positive-only
    # (is_positive_only); caas-pve maps to the plain caas redistribution
    # with the standard bounds (to_mrd), i.e. behaves as caas in ISL.
    positive_only = filter_ == "qlt-pve"
    if filter_.endswith("-pve"):
        filter_ = filter_[:-len("-pve")]
        if method not in ("pisl", "pislu", "isl"):
            raise ValueError("-mono *-pve is an ISL-family filter")
    rotate = None
    if rotate_grid:
        # Fixed pseudo-random rotations from the reference
        # (slmmir.cpp:1560-1581): vortex problems probe the cube corners;
        # otherwise keep the solid-body center off a collocation point.
        if ode.lower() == "movingvortices":
            rotate = ((1.0, 0.0, 0.0), 0.97654321 * np.pi / 4)
        else:
            rotate = ((0.11111, -0.051515, 1.0), 0.142314 * np.pi)
    mesh = cubed_sphere.build(ne, np_, basis, rotate=rotate, nonuni=nonuni,
                              mesh_type=mesh_type)
    # Subcell meshes refine the grid and force np=2 transport
    # (slmmir.cpp:445); pick up the effective sizes from the mesh.
    ne, np_, basis = mesh.ne, mesh.np_, mesh.basis_name
    # (QOF, IR) is not supported on subcell meshes - the IR density factor
    # FsmoFtm mixes per-target ref-square measures, which is unstable when
    # neighboring cells have different sizes; the reference switches to
    # CDG (slmmir.cpp:1837-1843).
    if mesh.is_subcell and dmc in ("f", "ef") and method == "ir":
        if verbose:
            print("WARNING: Switching to CDG; (QOF, IR) is not supported "
                  "for subcell mesh.")
        method = "cdg"
    wind = gallery.create_wind(ode)
    rho_remapper = None
    if prefine in (1, 5):
        # P-refinement experiments (slmmir -prefine, slmmir.cpp:106-115):
        # np=4 v-grid density + p-refined tracer grid. Experiment 5's
        # primary (IC/diagnostic) grid is the v-grid.
        from .transport.prefine import PRefineConfig, PRefineTransport
        cfg = PRefineConfig(ne=ne, np_=np_, basis=basis, filter=filter_,
                            limiter=limiter, experiment=prefine, nsub=nsub,
                            rotate=rotate, dmc=dmc)
        model = PRefineTransport(mesh, wind, cfg)
        if prefine == 5:
            mesh = model.mesh_v
    elif method in ("ir", "cdg"):
        from .transport.ir import IrConfig, IrTransport
        cfg = IrConfig(ne=ne, np_=np_, method=method, dmc=dmc,
                       filter=filter_, limiter=limiter, nsub=nsub,
                       tq=tq, d2c=d2c)
        model = IrTransport(mesh, wind, cfg)
    elif method == "isl":
        # Mixed method: rho by forward cell-integrated remap, tracers by
        # ISL (slmmir.cpp:1314-1322).
        from .transport.ir import IrConfig, IrTransport
        # The reference's isl rows use -dmc f (Homme mass). Default to a
        # local mass equality in the GLL measure so tracer masses (also
        # measured in GLL) conserve through Q = q*rho; any explicit dmc
        # choice (incl. the facet family) passes through.
        ir_dmc = "eh" if dmc == "none" else dmc
        ir_cfg = IrConfig(ne=ne, np_=np_, method="ir", dmc=ir_dmc,
                          filter="none", limiter="none", nsub=nsub,
                          tq=tq)
        rho_remapper = IrTransport(mesh, wind, ir_cfg)
        cfg = IslConfig(ne=ne, np_=np_, basis=basis, filter=filter_,
                        limiter=limiter, rho_isl=False, nsub=nsub,
                        dmc="f" if dmc == "none" else dmc,
                        positive_only=positive_only,
                        geom_dtype=geom_dtype, fitext=fitext,
                        timeint=timeint, interp_dtype=interp_dtype,
                        rotate=rotate)
        model = IslTransport(mesh, wind, cfg)
    else:
        # pislu = pisl with the natural (unstabilized GLL) interpolant
        # (slmmir.hpp:112,137).
        use_basis = "Gll" if method == "pislu" else basis
        cfg = IslConfig(ne=ne, np_=np_, basis=use_basis, filter=filter_,
                        limiter=limiter,
                        rho_isl=(method in ("pisl", "pislu")), nsub=nsub,
                        dmc="f" if dmc == "none" else dmc,
                        positive_only=positive_only,
                        geom_dtype=geom_dtype, fitext=fitext,
                        timeint=timeint, interp_dtype=interp_dtype,
                        rotate=rotate)
        model = IslTransport(mesh, wind, cfg)

    rho = jnp.ones((mesh.ncell, mesh.np2))
    q = init_tracers(mesh, ics)
    q0, rho0 = q, rho

    T = constants.day2sec(T_days)
    dt = T / nsteps

    F_gll = mesh.dgbfi_gll.reshape(-1)
    F_sph = mesh.dgbfi_sphere.reshape(-1)
    if prefine == 1:
        # Experiment 1's fine grid carries the pref-modified Homme mass
        # (fine-basis weights x interpolated v Jacobians,
        # calc_pref_gll_quantities) - the measure its CDR conserves.
        F_gll = model.F_f.reshape(-1)

    max_step_mass_err = 0.0
    max_step_bounds_err = 0.0
    # Per-step conservation check measure: the measure the model's CDR
    # actually conserves (sphere for dmc=es on the ISL and prefine-5
    # pipelines; prefine-1 conserves its pref-modified fine Homme mass).
    F_check0 = F_sph if (dmc == "es" and method not in ("ir", "cdg")
                         and prefine != 1) else F_gll
    mass_prev = float(bfb_sum(F_check0 * (q[0] * rho).reshape(-1)))
    q_min0 = float(jnp.min(q[0]))
    q_max0 = float(jnp.max(q[0]))

    # Terminator toy chemistry (SrcTermMgr, slmmir.cpp:512-648): when the
    # toychem1/toychem2 pair is present, apply reaction tendencies to the
    # mixing ratios before each transport step.
    toychem_idx = None
    low = [n.lower() for n in ics]
    if "toychem1" in low:
        i_cl = low.index("toychem1")
        if "toychem2" in low:
            toychem_idx = (i_cl, low.index("toychem2"))
            tc_lat, tc_lon = sphere.xyz2ll(
                mesh.cell_nodes_xyz.reshape(-1, 3))

    # Physgrid coupling (-pg nphys, slmmir.cpp:1006-1043, 1186-1232): keep
    # an FV companion state; source terms (toy chemistry) evaluate at the
    # FV subcell centers and their tendencies are remapped back to the GLL
    # grid in tracer-mass form (add_tendencies_from_physgrid,
    # slmmir_remapper_isl.cpp). The reference uses the elrecon Fv2Gll.
    pg_ops = None
    if pg > 0:
        from .ops import sqr
        from .transport.physgrid import PhysgridOps
        pg_ops = PhysgridOps(mesh, pg, "elrecon")
        edges = np.linspace(-1.0, 1.0, pg + 1)
        cmid = 0.5 * (edges[:-1] + edges[1:])
        Ac = jnp.asarray(np.tile(cmid, pg))
        Bc = jnp.asarray(np.repeat(cmid, pg))
        pts = sqr.ref_to_sphere(mesh.corners[:, None, :, :],
                                Ac[None, :], Bc[None, :])  # (ncell, nf2, 3)
        pg_lat, pg_lon = sphere.xyz2ll(pts.reshape(-1, 3))

    # Per-step field output (-io-type, slmmir.cpp:233-268; NetCDF writer or
    # the internal binary lat-lon raster via vis.py).
    writer = None
    vis_state = None
    if io_type == "netcdf":
        from . import io as io_mod
        writer = io_mod.NetcdfWriter(mesh, out_prefix + ".nc")
        writer.add_nodal_field("density")
        for i, n in enumerate(ics):
            writer.add_nodal_field(f"tracer_{n}{i}")
        writer.end_definition()
    elif io_type == "internal":
        from . import vis
        lat_g, lon_g = vis.latlon_grid(vis_res, 2 * vis_res)
        vis_state = (vis, lat_g, lon_g, [])

    def write_fields(t, rho_w, q_w):
        if writer is not None:
            writer.advance_time_to(t)
            writer.write_field("density", rho_w, mesh.dgbfi_sphere)
            for i, n in enumerate(ics):
                writer.write_field(f"tracer_{n}{i}", q_w[i],
                                   mesh.dgbfi_sphere)
        if vis_state is not None:
            vis, lat_g, lon_g, frames = vis_state
            frames.append([np.asarray(vis.sample_field(
                mesh, f, lat_g, lon_g)) for f in [rho_w] + list(q_w)])

    from .diagnostics import LauritzenDiag, Observer
    obs = None
    if observer_out:
        obs = Observer(F_gll, F_sph, ["rho"] + [f"{n}{i}" for i, n in
                                                enumerate(ics)])
        obs.add_obs(0.0, rho, list(q))
    ldiag = LauritzenDiag(nsteps, ics, q, F_sph) if lauritzen else None

    if io_type:
        write_fields(0.0, rho, q)

    pref_state = None
    t_start = time.time()
    for step in range(nsteps):
        ts = dt * step
        tf = T if step == nsteps - 1 else ts + dt
        if footprint and isinstance(model, IslTransport):
            fp = model.footprint_stats(ts, tf)
            print(f"footprint> {fp[0]:2d} {fp[1]:2d} {fp[2]:4.1f} {fp[3]:2d}")
        if toychem_idx is not None and pg_ops is not None:
            # Toy chemistry on the physgrid: evaluate at FV subcell
            # centers, remap the tendency masses back through fv2gll.
            i_cl, i_cl2 = toychem_idx
            rho_p, q_p = pg_ops.gll2fv(rho, q)
            cl_f, cl2_f = gallery.toychem_tendency(
                pg_lat, pg_lon, q_p[i_cl].reshape(-1),
                q_p[i_cl2].reshape(-1), dt)
            rho_safe = jnp.where(rho == 0, 1.0, rho)
            for i_t, tend in ((i_cl, cl_f), (i_cl2, cl2_f)):
                dq_p = (dt * tend).reshape(mesh.ncell, pg * pg)
                Qd = jnp.einsum('dp,cp->cd', pg_ops.op_j,
                                pg_ops.fv_met * rho_p * dq_p) \
                    / pg_ops.gll_met
                qi = q[i_t] + Qd / rho_safe
                # Bound by the pg-cell post-tendency range (union current
                # GLL range) - the reference's td.q_min/q_max contract:
                # zero tendency leaves the tracer unmodified, and the
                # unlimited elrecon remap can't introduce new extrema.
                qp_new = q_p[i_t] + dq_p
                lo = jnp.minimum(jnp.min(qp_new, -1), jnp.min(q[i_t], -1))
                hi = jnp.maximum(jnp.max(qp_new, -1), jnp.max(q[i_t], -1))
                q = q.at[i_t].set(
                    jnp.clip(qi, lo[:, None], hi[:, None]))
        elif toychem_idx is not None:
            i_cl, i_cl2 = toychem_idx
            cl = q[i_cl].reshape(-1)
            cl2 = q[i_cl2].reshape(-1)
            cl_f, cl2_f = gallery.toychem_tendency(tc_lat, tc_lon, cl, cl2,
                                                   dt)
            q = q.at[i_cl].add((dt * cl_f).reshape(q[i_cl].shape))
            q = q.at[i_cl2].add((dt * cl2_f).reshape(q[i_cl2].shape))
        if prefine in (1, 5):
            rho, q, pref_state = model.step(rho, q, ts, tf, pref_state)
        elif rho_remapper is not None:
            rho_tgt = rho_remapper.remap_rho(rho, ts, tf)
            rho, q = model.step(rho, q, ts, tf, rho_tgt=rho_tgt)
        else:
            rho, q = model.step(rho, q, ts, tf)
        if perturb_rho:
            # Mass-free random density perturbation for tracer-consistency
            # studies (Remapper::perturb_rho, slmmir_remapper.cpp:535-564):
            # project out the F-weighted mass, scale so rho stays > 0.
            import jax
            u = jax.random.uniform(jax.random.PRNGKey(step), rho.shape,
                                   minval=-1.0, maxval=1.0)
            Fg = mesh.dgbfi_gll
            u = u - Fg * (jnp.sum(Fg * u) / jnp.sum(Fg * Fg))
            fac = perturb_rho * jnp.min(rho) / jnp.max(jnp.abs(u))
            rho = rho + fac * u
        # Observer-style per-step checks on tracer 0 (slmmir.cpp:921-958),
        # in the run's conserved measure (sphere for -dmc es).
        F_check = F_sph if (dmc == "es" and method not in ("ir", "cdg")
                            and prefine not in (1, 5)) else F_gll
        mass = float(bfb_sum(F_check * (q[0] * rho).reshape(-1)))
        max_step_mass_err = max(max_step_mass_err,
                                abs(mass - mass_prev) / max(1.0, abs(mass)))
        mass_prev = mass
        if positive_only:
            # Positive-only runs check nonnegativity only
            # (Observer::check, slmmir.cpp:938-941).
            bl = max(0.0, -float(jnp.min(q[0])))
            bh = 0.0
        else:
            bl = max(0.0, q_min0 - float(jnp.min(q[0])))
            bh = max(0.0, float(jnp.max(q[0])) - q_max0)
        max_step_bounds_err = max(max_step_bounds_err, bl, bh)
        if obs:
            obs.add_obs(tf, rho, list(q))
        if ldiag:
            ldiag.run(step, q)
        if io_type and (step + 1) % max(1, write_every) == 0:
            write_fields(tf, rho, q)
        if (check_midpoint and nsteps % 2 == 0
                and step + 1 == nsteps // 2):
            # Midpoint check (slmmir.cpp:1453-1501): compare against one
            # giant pislu step (natural GLL interpolant, no filter) to T/2.
            ref_cfg = IslConfig(ne=ne, np_=np_, basis="Gll", filter="none",
                                limiter="none", rho_isl=True,
                                nsub=max(32, nsub * (nsteps // 2)))
            ref_model = IslTransport(mesh, wind, ref_cfg)
            _, q_ref = ref_model.step(rho0, q0, 0.0, T / 2)
            w = np.asarray(F_sph)
            for i in range(q.shape[0]):
                e = np.asarray(q[i] - q_ref[i]).reshape(-1)
                f = np.asarray(q_ref[i]).reshape(-1)
                l2 = np.sqrt((w * e * e).sum() / (w * f * f).sum())
                if verbose:
                    print(f"> mp tracer {i} re l2 {l2:9.3e}")
    jnp.asarray(rho).block_until_ready()
    et = (time.time() - t_start) / nsteps
    if timers and isinstance(model, IslTransport):
        # Per-phase breakdown (the reference's SLMM_TIME Timer printout,
        # slmmir.hpp:253-299 / slmmir.cpp).
        pt = model.phase_times(rho, q, 0.0, dt)
        tot = pt.get("full step", 1.0)
        for name, sec in pt.items():
            print(f"T {name:<24s} {sec:9.3e} s/step "
                  f"{100 * sec / tot:5.1f}%")
    if writer is not None:
        writer.close()
    if vis_state is not None:
        vis, lat_g, lon_g, frames = vis_state
        vis.write_raster(out_prefix + ".bin",
                         [f for frame in frames for f in frame])
    if obs:
        obs.dump(observer_out)
    if ldiag and verbose:
        ldiag.print_()

    # --- Final error norms (print_error, slmmir.cpp:355-412), tracer 0.
    fs = np.asarray(q0[0]).reshape(-1)
    ds = np.asarray(rho0).reshape(-1)
    fe = np.asarray(q[0]).reshape(-1)
    de = np.asarray(rho).reshape(-1)
    w = np.asarray(F_sph)
    wg = np.asarray(F_gll)
    e = fe - fs
    out = RunOutput(
        l2_err=float(np.sqrt(np.sum(w * e * e) / np.sum(w * fs * fs))),
        max_err=float(np.max(np.abs(e)) / np.max(np.abs(fs))),
        l1_err=float(np.sum(w * np.abs(e)) / np.sum(w * np.abs(fs))),
        mass_s=float(np.sum(w * fs * ds)), mass_e=float(np.sum(w * fe * de)),
        mass_gll_s=float(np.sum(wg * fs * ds)),
        mass_gll_e=float(np.sum(wg * fe * de)),
        min_s=float(fs.min()), max_s=float(fs.max()),
        min_e=float(fe.min()), max_e=float(fe.max()),
        et_timestep=et,
        max_step_mass_err=max_step_mass_err,
        max_step_bounds_err=max_step_bounds_err,
    )
    if verbose:
        print(out.one_liner(method=method, ode=ode, ic=ics[0], np=np_, ne=ne,
                            nsteps=nsteps, mono=filter_, lim=limiter))
    return out


def main(argv=None):
    """CLI mirroring the essential slmmir flags (slmmir.cpp:4-117)."""
    import argparse
    p = argparse.ArgumentParser(description="compose_tpu transport driver")
    p.add_argument("-method", default="pisl",
                   choices=["pisl", "isl", "pislu", "ir", "cdg"])
    p.add_argument("-dmc", default="none",
                   choices=["none", "es", "eh", "f", "ef", "geh"])
    p.add_argument("-ode", default="divergent")
    p.add_argument("-ic", action="append", default=None)
    p.add_argument("-ne", type=int, default=10)
    p.add_argument("-np", dest="np_", type=int, default=4)
    p.add_argument("-nsteps", type=int, default=12)
    p.add_argument("-T", type=float, default=12.0)
    p.add_argument("-mono", dest="filter_", default="qlt",
                   choices=["qlt", "qlt-pve", "caas", "caas-pve", "mn2",
                            "caas-node", "none"])
    p.add_argument("-lim", dest="limiter", default="mn2",
                   choices=["mn2", "caas", "caags", "qlt", "none"])
    p.add_argument("-basis", default="GllNodal")
    p.add_argument("-tq", type=int, default=None,
                   help="triangle-quadrature order for the IR/CDG T fill (slmmir -tq; 4 = reduced quadrature)")
    p.add_argument("-d2c", dest="d2c", action="store_true",
                   default=None,
                   help="make CI fields continuous each step (slmmir -d2c; the library default is on, -no-d2c turns it off)")
    p.add_argument("-no-d2c", dest="d2c", action="store_false")
    p.add_argument("-nsub", type=int, default=8)
    p.add_argument("-interp", dest="interp_dtype", default="f64",
                   choices=["f64", "f32"],
                   help="tracer interpolation precision (f32 = bench fast "
                        "path; mass/bounds invariants stay f64)")
    p.add_argument("-geom", dest="geom_dtype", default="f64",
                   choices=["f64", "f32"],
                   help="precision of the geometric pipeline (f32 = fast "
                        "path; mass/bounds invariants stay f64)")
    p.add_argument("-lauritzen", action="store_true")
    p.add_argument("-fitext", action="store_true")
    p.add_argument("-rotate-grid", dest="rotate_grid", action="store_true")
    p.add_argument("-timeint", default="exact",
                   choices=["exact", "interp", "line", "interpline"])
    p.add_argument("--perturb-rho", dest="perturb_rho", type=float,
                   default=0.0)
    p.add_argument("-midpoint-check", dest="check_midpoint",
                   action="store_true")
    p.add_argument("-rit", dest="observer_out", default=None,
                   help="record metrics in time to this JSON file")
    p.add_argument("-footprint", action="store_true",
                   help="track ISL communication footprints")
    p.add_argument("-timers", action="store_true",
                   help="print the per-phase step-time breakdown "
                        "(SLMM_TIME equivalent)")
    p.add_argument("-io-type", dest="io_type", default=None,
                   choices=["netcdf", "internal"])
    p.add_argument("-o", dest="out_prefix", default="slmmir_out")
    p.add_argument("-we", dest="write_every", type=int, default=1)
    p.add_argument("-res", dest="vis_res", type=int, default=64,
                   help="lat resolution of the internal raster output")
    p.add_argument("-prefine", type=int, default=0, choices=[0, 1, 5],
                   help="p-refinement experiment (np=4 v-grid + p-refined "
                        "tracer grid); 0 = none")
    p.add_argument("-nonuni", "-nonunimesh", dest="nonuni", type=int,
                   default=0, help="nonuniform warped mesh (0 = uniform)")
    p.add_argument("-pg", type=int, default=0,
                   help="physgrid nphys (FV physics grid); 0 = none")
    p.add_argument("-mesh", dest="mesh_type", default="geometric",
                   choices=["geometric", "gllsubcell", "runisubcell",
                            "g", "gllsc", "runisc"],
                   help="mesh type (subcell types force np=2 transport on "
                        "the refined grid, slmmir.hpp:79-107)")
    a = p.parse_args(argv)
    ics = tuple(a.ic) if a.ic else ("gaussianhills",)
    mt = {"g": "geometric", "gllsc": "gllsubcell",
          "runisc": "runisubcell"}.get(a.mesh_type, a.mesh_type)
    run(ne=a.ne, np_=a.np_, nsteps=a.nsteps, T_days=a.T, ics=ics, ode=a.ode,
        method=a.method, filter_=a.filter_, limiter=a.limiter, basis=a.basis,
        nsub=a.nsub, dmc=a.dmc, lauritzen=a.lauritzen,
        observer_out=a.observer_out, check_midpoint=a.check_midpoint,
        geom_dtype=a.geom_dtype, fitext=a.fitext,
        rotate_grid=a.rotate_grid, timeint=a.timeint,
        perturb_rho=a.perturb_rho, footprint=a.footprint,
        io_type=a.io_type, out_prefix=a.out_prefix,
        write_every=a.write_every, vis_res=a.vis_res, prefine=a.prefine,
        nonuni=bool(a.nonuni), pg=a.pg, mesh_type=mt,
        interp_dtype=a.interp_dtype, timers=a.timers, tq=a.tq,
        d2c=True if a.d2c is None else a.d2c)


if __name__ == "__main__":
    main()
