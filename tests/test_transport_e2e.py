"""End-to-end transport runs against the reference's golden thresholds
(/root/reference/methods/slmm/slmm_runtests.py:113-133). Each run asserts
the parsed one-liner values exactly as the reference regression suite does:
l2 error below golden, GLL-mass conservation <= 5e-14, extrema within the
slotted-cylinders bounds [0.1, 1.0].
"""

import pytest

from compose_tpu import driver

ICS = ("slottedcylinders", "cosinebells", "gaussianhills")


def check(out, l2_err, cv_gll=5e-14, mo_min=0.1, mo_max=1.0):
    assert out.l2_err > 0
    assert out.l2_err <= l2_err, out.l2_err
    assert out.cv_gll <= cv_gll, out.cv_gll
    assert out.min_e >= mo_min, out.min_e
    assert out.max_e <= mo_max, out.max_e
    # Internal per-step invariants (Observer::check, slmmir.cpp:955-957).
    assert out.max_step_mass_err < 1e-12
    assert out.max_step_bounds_err < 5e-13


def test_smoke_caas_ne4():
    out = driver.run(ne=4, np_=4, nsteps=3, ics=("gaussianhills",),
                     filter_="caas", limiter="caas", nsub=2, verbose=False)
    assert out.cv_gll <= 5e-14
    assert out.max_step_mass_err < 1e-12
    assert out.l2_err < 0.5


@pytest.mark.slow
def test_golden_pisl_qlt_ne10():
    # slmm_runtests.py:115-116: pisl np4 ne10 mono=qlt -> l2 <= 3.34e-1.
    out = driver.run(ne=10, np_=4, nsteps=12, ics=ICS, filter_="qlt",
                     limiter="mn2", verbose=False)
    check(out, 3.34e-1)


def test_positive_only_smoke():
    """-mono qlt-pve (positive-only): bounds relax to [0, 2]
    (slmmir_remapper_isl.cpp:1332), conservation still exact, and the
    shape-bounds no longer clamp (max may exceed the qlt-run max)."""
    out = driver.run(ne=4, np_=4, nsteps=3, ics=("slottedcylinders",),
                     filter_="qlt-pve", limiter="mn2", nsub=2,
                     verbose=False)
    assert out.min_e >= 0.0
    assert out.max_e <= 2.0
    assert out.cv_gll <= 5e-14
    assert out.max_step_mass_err < 1e-12
    # caas-pve is to_mrd-equivalent to caas (slmmir.hpp:173-179): same
    # redistribution, standard bounds.
    out_cp = driver.run(ne=4, np_=4, nsteps=3, ics=("slottedcylinders",),
                        filter_="caas-pve", limiter="mn2", nsub=2,
                        verbose=False)
    out_c = driver.run(ne=4, np_=4, nsteps=3, ics=("slottedcylinders",),
                       filter_="caas", limiter="mn2", nsub=2, verbose=False)
    assert out_cp.l2_err == out_c.l2_err


@pytest.mark.slow
def test_golden_pisl_qlt_pve_ne10():
    # slmm_runtests.py:121-122: pisl np4 ne10 mono=qlt-pve ->
    # l2 <= 3.36e-1, cv_gll <= 5e-14, min=0, max=2.
    out = driver.run(ne=10, np_=4, nsteps=12, ics=ICS, filter_="qlt-pve",
                     limiter="mn2", verbose=False)
    assert 0 < out.l2_err <= 3.36e-1
    assert out.cv_gll <= 5e-14
    assert out.min_e >= 0.0
    assert out.max_e <= 2.0
    assert out.max_step_mass_err < 1e-12
    assert out.max_step_bounds_err < 5e-13


@pytest.mark.slow
def test_golden_pisl_caas_ne10():
    # slmm_runtests.py:123-124: pisl np4 ne10 mono=caas -> l2 <= 3.47e-1.
    out = driver.run(ne=10, np_=4, nsteps=12, ics=ICS, filter_="caas",
                     limiter="mn2", verbose=False)
    check(out, 3.47e-1)


@pytest.mark.slow
def test_golden_pisl_qlt_np6():
    # slmm_runtests.py:117-118: pisl np6 ne6 mono=qlt -> l2 <= 3.34e-1
    # (exercises the islet GllNodal np=6 free-node-subset basis).
    out = driver.run(ne=6, np_=6, nsteps=12, ics=ICS, filter_="qlt",
                     limiter="mn2", verbose=False)
    check(out, 3.34e-1)


@pytest.mark.slow
def test_golden_pisl_np12_interp_timeint():
    # slmm_runtests.py:135-146: pisl np12 ne3 gaussianhills, exact and
    # interpolated trajectories; and the caas+bounds row.
    out = driver.run(ne=3, np_=12, nsteps=12, ics=("gaussianhills",),
                     filter_="none", limiter="none", verbose=False)
    assert 0 < out.l2_err <= 8.793e-3
    out = driver.run(ne=3, np_=12, nsteps=12, ics=("gaussianhills",),
                     filter_="none", limiter="none", timeint="interp",
                     verbose=False)
    assert 0 < out.l2_err <= 9.939e-3
    out = driver.run(ne=3, np_=12, nsteps=12, ics=("slottedcylinders",),
                     filter_="caas", limiter="mn2", timeint="interp",
                     verbose=False)
    assert 0 < out.l2_err <= 2.896e-1
    assert out.cv_gll <= 5e-14
    assert out.min_e >= 0.1 and out.max_e <= 1.0


@pytest.mark.slow
def test_golden_ir_ne10():
    # slmm_runtests.py:188: ir np4 ne10 divergent gaussianhills ->
    # l2 <= 1.02e-2, cv <= 8e-15.
    out = driver.run(ne=10, np_=4, nsteps=12, ics=("gaussianhills",),
                     method="ir", filter_="none", limiter="none",
                     verbose=False)
    assert 0 < out.l2_err <= 1.02e-2
    assert out.cv <= 8e-15


@pytest.mark.slow
def test_golden_ir_qlt_slotted():
    # slmm_runtests.py:193-195: ir np4 ne10 + qlt -> l2 <= 3.0e-1,
    # cv <= 3e-14, bounds [0.1, 1].
    out = driver.run(ne=10, np_=4, nsteps=12, ics=("slottedcylinders",),
                     method="ir", filter_="qlt", limiter="mn2",
                     verbose=False)
    assert 0 < out.l2_err <= 3.0e-1
    assert out.cv <= 3e-14
    assert out.min_e >= 0.1 - 5e-13
    assert out.max_e <= 1.0 + 5e-13


@pytest.mark.slow
def test_golden_isl_qlt_ne10():
    # slmm_runtests.py:119-120: isl np4 ne10 mono=qlt (rho by cell-
    # integrated remap, tracers by ISL) -> l2 <= 3.47e-1.
    out = driver.run(ne=10, np_=4, nsteps=12, ics=ICS, method="isl",
                     filter_="qlt", limiter="mn2", verbose=False)
    check(out, 3.47e-1)


@pytest.mark.slow
def test_golden_tracer_consistency():
    # slmm_runtests.py:129-132: constant q with remapped rho stays exactly
    # 0.42 (-method isl, the reference's strictest consistency row).
    out = driver.run(ne=10, np_=4, nsteps=12, ics=("constant",),
                     filter_="qlt", limiter="mn2", method="isl",
                     verbose=False)
    assert out.l2_err <= 3e-15
    assert out.cv_gll <= 1e-13
    assert out.min_e >= 0.42 and out.max_e <= 0.42


def test_ir_dmc_variants_conservation():
    """The DMC family (Dmc, slmmir.hpp:13-77): each variant conserves mass
    in its own measure - es exactly in the sphere measure, eh/ef in the
    GLL (Homme) measure via per-cell equality, f by facet transport alone
    (a few ulps), geh by one global equality constraint."""
    out = driver.run(ne=4, np_=4, nsteps=6, ics=("gaussianhills",),
                     method="ir", dmc="ef", filter_="none", limiter="none",
                     verbose=False)
    assert out.cv_gll < 5e-14
    assert out.l2_err < 0.2
    out = driver.run(ne=4, np_=4, nsteps=6, ics=("gaussianhills",),
                     method="ir", dmc="geh", filter_="none", limiter="none",
                     verbose=False)
    assert out.cv_gll < 1e-13
    assert out.l2_err < 0.2


def test_pisl_local_qlt_limiter():
    """Cell-local tensor-2d QLT limiter (-lim qlt) preserves bounds and
    mass through a short pisl run."""
    out = driver.run(ne=4, np_=4, nsteps=3, ics=("cosinebells",),
                     filter_="caas", limiter="qlt", verbose=False)
    assert out.max_step_bounds_err == 0.0
    assert out.cv_gll < 5e-14


def test_prefine_experiments():
    """P-refinement experiments 1 and 5 (slmmir -prefine): np=4 v-grid
    density + p-refined tracer grid. Both conserve tracer mass exactly in
    their primary measure and preserve bounds."""
    for exp in (5, 1):
        out = driver.run(ne=3, np_=6, nsteps=3, ics=("gaussianhills",),
                         filter_="caas", limiter="caas", prefine=exp,
                         verbose=False)
        assert out.cv_gll < 5e-14, (exp, out.cv_gll)
        assert out.max_step_bounds_err < 5e-13, (exp, out.max_step_bounds_err)
        assert out.l2_err < 0.2, (exp, out.l2_err)


def test_nonuniform_mesh_transport():
    """pisl on the nonuniform warped mesh (-nonunimesh): conservation and
    bounds hold in the warped mesh's own measure."""
    out = driver.run(ne=5, np_=4, nsteps=3, ics=("gaussianhills",),
                     filter_="caas", limiter="caas", nonuni=True,
                     verbose=False)
    assert out.cv_gll < 5e-14
    assert out.max_step_bounds_err < 5e-13
    assert out.l2_err < 0.5


def test_physgrid_coupled_toychem():
    """-pg: terminator toy chemistry evaluated at FV subcell centers with
    tendencies remapped back in tracer-mass form; tracers stay within the
    toychem bounds [0, 4e-6]."""
    out = driver.run(ne=4, np_=4, nsteps=3, ics=("toychem1", "toychem2"),
                     filter_="caas", limiter="caas", nsub=2, pg=2,
                     verbose=False)
    assert out.min_e >= 0.0
    assert out.max_e <= 4.0000001e-06


def test_subcell_meshes():
    """Subcell mesh types (MeshType, slmmir.hpp:79-107): np=2 transport on
    the GLL- or uniformly-refined geometric mesh, property preserving."""
    for mt in ("gllsubcell", "runisubcell"):
        out = driver.run(ne=3, np_=4, nsteps=3, ics=("gaussianhills",),
                         filter_="caas", limiter="caas", nsub=2,
                         mesh_type=mt, verbose=False)
        assert out.cv_gll < 5e-14, (mt, out.cv_gll)
        assert out.max_step_bounds_err < 5e-13
        assert out.l2_err < 0.5


def test_line_timeint():
    """-timeint line / interpline: the reference's 2-evaluation midpoint
    study integrator. Conservation and bounds are unaffected (only
    trajectory accuracy changes)."""
    out = driver.run(ne=4, np_=4, nsteps=3, ics=("gaussianhills",),
                     filter_="caas", limiter="caas", timeint="line",
                     verbose=False)
    assert out.cv_gll < 5e-14
    assert out.max_step_bounds_err < 5e-13
    out = driver.run(ne=3, np_=6, nsteps=3, ics=("gaussianhills",),
                     filter_="caas", limiter="caas", timeint="interpline",
                     verbose=False)
    assert out.cv_gll < 5e-14


def test_interp_f32_invariants():
    """The f32 interp fast path (bench config): conservation and bounds
    are enforced in f64 downstream, so the invariants match the f64 path;
    only O(1e-7) interpolation noise enters the solution."""
    kw = dict(ne=4, np_=4, nsteps=3, ics=("cosinebells",), filter_="caas",
              limiter="caas", nsub=2, verbose=False)
    out32 = driver.run(geom_dtype="f32", interp_dtype="f32", **kw)
    out64 = driver.run(**kw)
    assert out32.cv_gll < 5e-14
    assert out32.max_step_bounds_err == 0.0
    assert abs(out32.l2_err - out64.l2_err) < 1e-4
