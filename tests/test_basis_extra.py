"""The remaining Basis::Type members: uniform_reduced, constant_cell, and
string-defined bases (slmm_basis.cpp:36-56, slmm_basis_reduced.{hpp,cpp},
slmm_islet_string.cpp), reachable from -basis like the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from compose_tpu import basis, driver


def test_uniform_reduced_weights_match_reference_tables():
    # slmm_basis_reduced.hpp tabulates compute_weights output; ours must
    # reproduce it (spot rows np4, np5, np8).
    b4 = basis.create("uniform_reduced", 4)
    assert np.allclose(np.asarray(b4.w),
                       [1 / 3, 2 / 3, 2 / 3, 1 / 3], atol=1e-15)
    b5 = basis.create("uniform_reduced", 5)
    assert np.allclose(np.asarray(b5.w), [.25, .5, .5, .5, .25], atol=1e-15)
    b8 = basis.create("uniform_reduced", 8)
    w8 = [1.4285714285714288e-01] + [2.8571428571428575e-01] * 6 \
        + [1.4285714285714288e-01]
    assert np.allclose(np.asarray(b8.w), w8, atol=1e-14)


def test_uniform_reduced_eval_piecewise_linear():
    b = basis.create("uniform_reduced", 6)
    xs = jnp.linspace(-1, 1, 41)
    v = np.asarray(b.eval(xs))
    # Partition of unity and nodal interpolation.
    assert np.allclose(v.sum(-1), 1.0, atol=1e-14)
    vn = np.asarray(b.eval(b.x))
    assert np.allclose(vn, np.eye(6), atol=1e-13)
    # max_degree == 1: linear functions reproduced exactly within regions.
    f = np.asarray(b.x) * 0.3 + 0.1
    interp = v @ f
    assert np.allclose(interp, np.asarray(xs) * 0.3 + 0.1, atol=1e-14)
    # Degree-2 NOT reproduced (it is a reduced basis).
    f2 = np.asarray(b.x) ** 2
    assert np.abs(v @ f2 - np.asarray(xs) ** 2).max() > 1e-3


def test_constant_cell_eval():
    b = basis.create("constant_cell", 4)
    xs = jnp.linspace(-1, 1, 21)
    v = np.asarray(b.eval(xs))
    assert np.allclose(v.sum(-1), 1.0)
    assert set(np.unique(v)) <= {0.0, 1.0}
    assert abs(float(jnp.sum(b.w)) - 2.0) < 1e-14


def test_string_defined_basis_matches_builtin():
    """A -basis string reproducing the np=4 GllNodal subsets evaluates
    identically to the built-in (the reference's GllNodalFromString path,
    slmmir.cpp:1541)."""
    # np=5 GllOffsetNodal regions are (0,3),(0,4) -> subsets [0,1,2],
    # [0,1,2,3] (np=4's built-in uses its special subgrid scheme, so np=5
    # is the smallest plain region-wise case).
    ref = basis.create("GllOffsetNodal", 5)
    s = "5 1 | 0 3: 0 1 2 | 1 4: 0 1 2 3"
    b = basis.create(s, 5)
    xs = jnp.linspace(-1, 1, 57)
    assert np.allclose(np.asarray(b.eval(xs)), np.asarray(ref.eval(xs)),
                       atol=1e-13)
    assert np.allclose(np.asarray(b.w), np.asarray(ref.w), atol=1e-12)


def test_string_basis_validation():
    with pytest.raises(ValueError):
        basis.create("4 1 | 0 3: 0 1 2", 4)          # missing region
    with pytest.raises(ValueError):
        basis.create("4 1 | 0 3: 0 2 3 | 1 4: 0 1 2 3", 4)  # no node 1
    with pytest.raises(ValueError):
        basis.create("4 1 | 0 3: 0 1 2 | 1 4: 0 1 2 3", 6)  # np mismatch


def test_transport_with_uniform_reduced():
    """-basis uniform_reduced end-to-end: conservation and bounds hold
    (accuracy is reduced by design - the basis is piecewise linear)."""
    out = driver.run(ne=4, np_=4, nsteps=3, ics=("cosinebells",),
                     filter_="caas", limiter="caas", nsub=2,
                     basis="uniform_reduced", verbose=False)
    assert out.cv_gll < 5e-14
    assert out.max_step_bounds_err < 5e-13
    assert out.l2_err < 0.8


def test_transport_with_string_basis():
    out = driver.run(ne=4, np_=4, nsteps=2, ics=("gaussianhills",),
                     filter_="caas", limiter="caas", nsub=2,
                     basis="4 1 | 0 3: 0 1 2 | 1 4: 0 1 2 3",
                     verbose=False)
    assert out.cv_gll < 5e-14
    assert np.isfinite(out.l2_err)


def test_free_nodal_from_string_matches_table():
    """A FreeNodalFromString built from the np4 FreeNodal table's own
    nodes/subsets must reproduce islet::FreeNodal np4 exactly
    (slmm_basis.cpp:48-59 selects the free-nodal path when the string
    carries an 'x <coords>' tail)."""
    xs = "-1 -4.4721359549995793e-01 4.4721359549995793e-01 1"
    b = basis.create(f"4 1 | 0 3: 0 1 2 | 1 4: 0 1 2 3 x {xs}", 4)
    assert b.name == "FreeNodalFromString"
    ref = basis.create("FreeNodal", 4)
    pts = jnp.linspace(-1.0, 1.0, 23)
    assert np.array_equal(np.asarray(b.eval(pts)), np.asarray(ref.eval(pts)))
    assert np.allclose(np.asarray(b.x), np.asarray(ref.x))
    assert np.allclose(np.asarray(b.w), np.asarray(ref.w), atol=1e-13)


def test_free_nodal_from_string_validation():
    with pytest.raises(ValueError):   # wrong x count
        basis.create("4 1 | 0 3: 0 1 2 | 1 4: 0 1 2 3 x -1 0 1", 4)
    with pytest.raises(ValueError):   # not increasing
        basis.create("4 1 | 0 3: 0 1 2 | 1 4: 0 1 2 3 x -1 .5 -.5 1", 4)
