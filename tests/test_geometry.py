"""Geometry-layer tests, modeled on the reference's siqk tests:
area = 4*pi (siqk_test.cpp:426-449) and sphere<->ref roundtrip including
out-of-element points (siqk_sqr.hpp:187-265)."""

import numpy as np
import jax.numpy as jnp
import pytest

from compose_tpu import basis
from compose_tpu.mesh import build, get_cell_idx
from compose_tpu.ops import quadrature, sphere, sqr


def test_gll_nodes_weights_match_reference_tables():
    # slmm_gll.hpp hard-codes these; we compute them. np=4:
    x, w = basis.gll_nodes_weights(4)
    a = 1.0 / np.sqrt(5.0)
    assert np.allclose(x, [-1, -a, a, 1], atol=1e-15)
    assert np.allclose(w, [1. / 6, 5. / 6, 5. / 6, 1. / 6], atol=1e-15)
    x8, w8 = basis.gll_nodes_weights(8)
    assert abs(np.sum(w8) - 2) < 1e-14
    assert np.allclose(x8, -x8[::-1], atol=1e-16)


def test_lagrange_partition_of_unity():
    for np_ in (2, 3, 4, 6, 8):
        b = basis.GLL(np_)
        xs = jnp.linspace(-1, 1, 33)
        v = b.eval(xs)
        assert np.allclose(np.sum(np.asarray(v), axis=-1), 1.0, atol=1e-13)
        # Exact at nodes.
        vn = np.asarray(b.eval(b.x))
        assert np.allclose(vn, np.eye(np_), atol=1e-13)


def test_islet_np4_basis():
    b = basis.create("GllNodal", 4)
    xs = jnp.linspace(-1, 1, 101)
    v = np.asarray(b.eval(xs))
    assert np.allclose(v.sum(axis=-1), 1.0, atol=1e-13)
    vn = np.asarray(b.eval(b.x))
    assert np.allclose(vn, np.eye(4), atol=1e-13)
    # Interior region must agree with plain cubic GLL.
    g = basis.GLL(4)
    xi = jnp.linspace(-0.4, 0.4, 11)
    assert np.allclose(np.asarray(b.eval(xi)), np.asarray(g.eval(xi)),
                       atol=1e-14)
    # Symmetry: v(x)_i == v(-x)_{np-1-i}.
    vm = np.asarray(b.eval(-xs))
    assert np.allclose(v, vm[..., ::-1], atol=1e-14)


def test_islet_all_families():
    # Every tabulated basis family: partition of unity, nodal exactness,
    # symmetry, weight sum 2.
    cases = [("GllNodal", n) for n in (5, 7, 8, 9, 10, 13, 16)]
    cases += [("GllOffsetNodal", n) for n in (5, 8, 12)]
    cases += [("UniformOffsetNodal", n) for n in (4, 7, 12)]
    cases += [("FreeNodal", n) for n in (4, 7, 10)]
    xs = jnp.linspace(-1, 1, 41)
    for name, np_ in cases:
        b = basis.create(name, np_)
        v = np.asarray(b.eval(xs))
        assert np.abs(v.sum(-1) - 1).max() < 1e-11, (name, np_)
        vn = np.asarray(b.eval(b.x))
        assert np.abs(vn - np.eye(np_)).max() < 1e-11, (name, np_)
        vm = np.asarray(b.eval(-xs))
        assert np.abs(v - vm[..., ::-1]).max() < 1e-12, (name, np_)
        assert abs(float(b.w.sum()) - 2) < 1e-12, (name, np_)


def test_islet_np6_basis():
    b = basis.create("GllNodal", 6)
    xs = jnp.linspace(-1, 1, 101)
    v = np.asarray(b.eval(xs))
    assert np.allclose(v.sum(axis=-1), 1.0, atol=1e-12)
    vn = np.asarray(b.eval(b.x))
    assert np.allclose(vn, np.eye(6), atol=1e-12)
    vm = np.asarray(b.eval(-xs))
    assert np.allclose(v, vm[..., ::-1], atol=1e-13)


def test_triangle_quadrature_exactness():
    # Integrate x^p y^q over the unit simplex: p! q! / (p+q+2)!
    import math
    bary, w = quadrature.get_coef(8)
    for (p, q) in ((0, 0), (1, 0), (2, 3), (4, 4), (0, 8)):
        val = 0.5 * np.sum(w * bary[:, 0] ** p * bary[:, 1] ** q)
        exact = (math.factorial(p) * math.factorial(q)
                 / math.factorial(p + q + 2))
        assert abs(val - exact) < 1e-15, (p, q)


def test_sphere_to_ref_roundtrip():
    m = build(4, 4)
    rng = np.random.default_rng(0)
    ci = rng.integers(0, m.ncell, 64)
    corners = m.corners[jnp.asarray(ci)]
    # Include out-of-element coords like the reference test (siqk_sqr.hpp:193).
    a_t = jnp.asarray(rng.uniform(-1.1, 1.1, 64))
    b_t = jnp.asarray(rng.uniform(-1.1, 1.1, 64))
    q = sqr.ref_to_sphere(corners, a_t, b_t)
    a, b = sqr.sphere_to_ref(corners, q)
    assert np.max(np.abs(np.asarray(a - a_t))) < 1e-11
    assert np.max(np.abs(np.asarray(b - b_t))) < 1e-11


def test_mesh_area_4pi():
    # Reference checks total sphere area to rel 1e-8 (siqk_test.cpp:426-449).
    m = build(5, 4)
    area = float(jnp.sum(m.dgbfi_sphere))
    assert abs(area - 4 * np.pi) / (4 * np.pi) < 1e-10
    area_gll = float(jnp.sum(m.dgbfi_gll))
    assert abs(area_gll - 4 * np.pi) / (4 * np.pi) < 1e-3


def test_mesh_cgll_numbering():
    ne, np_ = 4, 4
    m = build(ne, np_)
    # Continuous node count for a cubed-sphere CGLL mesh:
    n = ne * (np_ - 1)
    expected = 6 * n * n + 2
    assert m.cnn == expected
    # Every continuous node referenced at least once; shared nodes have
    # identical coordinates from every owning cell (to roundoff).
    d2c = np.asarray(m.dgll2cgll).ravel()
    assert d2c.min() == 0 and d2c.max() == m.cnn - 1
    nodes = np.asarray(m.cell_nodes_xyz).reshape(-1, 3)
    cg = np.asarray(m.cgll_xyz)
    err = np.abs(nodes - cg[d2c]).max()
    assert err < 1e-13


def test_get_cell_idx_consistency():
    ne = 6
    m = build(ne, 4)
    # The center of every cell must locate to that cell.
    centers = sphere.normalize(jnp.mean(m.corners, axis=1))
    ci = np.asarray(get_cell_idx(ne, centers))
    assert np.array_equal(ci, np.arange(m.ncell))
    # Every cell node must locate into a cell that contains it (node on a
    # boundary may go to either side; verify via ref coords within [-1-eps,
    # 1+eps]).
    p = m.cell_nodes_xyz.reshape(-1, 3)
    ci = get_cell_idx(ne, p)
    a, b = sqr.sphere_to_ref(m.corners[ci], p)
    assert float(jnp.max(jnp.abs(a))) < 1 + 1e-9
    assert float(jnp.max(jnp.abs(b))) < 1 + 1e-9


def test_node_jacobian_positive():
    m = build(3, 4)
    assert float(jnp.min(m.jac_node)) > 0
    assert float(jnp.min(m.dgbfi_sphere)) > 0


def test_nonuniform_mesh_locator():
    """Nonuniform warped mesh (slmm_mesh.cpp:808-833): the inverse-warp +
    ring-1 Newton locator (the octree replacement) reconstructs arbitrary
    sphere points through their located cell exactly."""
    import numpy as np
    from compose_tpu.mesh import cubed_sphere
    from compose_tpu.ops import sqr
    m = cubed_sphere.build(5, 4, nonuni=True)
    rng = np.random.default_rng(3)
    q = rng.normal(size=(4000, 3))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ci, a, b = cubed_sphere.locate(m, jnp.asarray(q))
    rec = np.asarray(sqr.ref_to_sphere(m.corners[ci], a, b))
    assert np.abs(rec - q).max() < 1e-12
    assert float(jnp.abs(a).max()) < 1 + 1e-9
    assert float(jnp.abs(b).max()) < 1 + 1e-9


def test_subcell_mesh_locator():
    """Subcell locate: parent-first estimates feed a converged Newton on
    the subcell corners for arbitrary points."""
    import numpy as np
    from compose_tpu.mesh import cubed_sphere
    from compose_tpu.ops import sqr
    for mt in ("gllsubcell", "runisubcell"):
        m = cubed_sphere.build(3, 4, mesh_type=mt)
        assert m.ne == 9 and m.np_ == 2
        rng = np.random.default_rng(5)
        q = rng.normal(size=(2000, 3))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        qj = jnp.asarray(q)
        ci, a0, b0 = cubed_sphere.locate(m, qj)
        a, b = sqr.sphere_to_ref(m.corners[ci], qj, a0=a0, b0=b0)
        rec = np.asarray(sqr.ref_to_sphere(m.corners[ci], a, b))
        assert np.abs(rec - q).max() < 1e-12
        assert float(jnp.abs(a).max()) < 1 + 1e-6
        assert float(jnp.abs(b).max()) < 1 + 1e-6
