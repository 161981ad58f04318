"""Face-grid DSS (transport/dss_face.py) vs the gather formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import dss
from compose_tpu.transport.dss_face import FaceDss


def _mesh(ne=3, np_=4, **kw):
    return cubed_sphere.build(ne, np_, **kw)


@pytest.mark.parametrize("ne,np_", [(3, 4), (2, 6), (1, 4), (4, 2)])
def test_dss_face_matches_gather(ne, np_):
    m = _mesh(ne, np_)
    fd = FaceDss.build(m)
    assert fd is not None
    rng = np.random.RandomState(7 * ne + np_)
    f = jnp.asarray(rng.rand(m.ncell, m.np2))
    ref = dss.dss_gather(f.reshape(-1), m.dgll2cgll.reshape(-1), m.c2d_idx,
                         m.c2d_mask, m.dgbfi_gll.reshape(-1))
    got = fd.dss(f).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-15)
    # Continuity: coincident slots carry identical values.
    gotn = np.asarray(got)
    d2c = np.asarray(m.dgll2cgll).reshape(-1)
    for node in [0, 1, m.cnn // 2, m.cnn - 1]:
        sel = gotn[d2c == node]
        assert np.all(sel == sel[0])


def test_dss_face_tracers_and_q():
    m = _mesh(3, 4)
    fd = FaceDss.build(m)
    rng = np.random.RandomState(3)
    nt = 5
    q = jnp.asarray(rng.rand(nt, m.ncell, m.np2))
    rho = jnp.asarray(0.5 + rng.rand(m.ncell, m.np2))
    Ff = m.dgbfi_gll.reshape(-1)
    d2c = m.dgll2cgll.reshape(-1)

    ref = dss.dss_gather(q.reshape(nt, -1), d2c, m.c2d_idx, m.c2d_mask, Ff)
    got = fd.dss(q).reshape(nt, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-15)

    ref = dss.dss_q_gather_t(rho.reshape(-1), q.reshape(nt, -1), d2c,
                             m.c2d_idx, m.c2d_mask, Ff)
    got = fd.dss_q(rho, q).reshape(nt, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-15)


def test_dss_face_q_zero_mass_fallback():
    m = _mesh(3, 4)
    fd = FaceDss.build(m)
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.rand(2, m.ncell, m.np2))
    rho = np.asarray(0.5 + rng.rand(m.ncell, m.np2))
    rho[:2] = 0.0  # two adjacent cells: shared nodes hit the den==0 path
    rho = jnp.asarray(rho)
    Ff = m.dgbfi_gll.reshape(-1)
    d2c = m.dgll2cgll.reshape(-1)
    ref = dss.dss_q_gather_t(rho.reshape(-1), q.reshape(2, -1), d2c,
                             m.c2d_idx, m.c2d_mask, Ff)
    got = fd.dss_q(rho, q).reshape(2, -1)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-15)


def test_dss_face_rotated_mesh_ok_subcell_rejected():
    # Rotation changes geometry, not numbering: face DSS applies.
    m = _mesh(2, 4, rotate=((0.2, 0.3, 0.9), 0.7))
    assert FaceDss.build(m) is not None
    # Subcell meshes renumber cells; the structural validation must reject
    # (or accept only if the numbering really matches - never silently
    # produce wrong coincidence classes).
    ms = cubed_sphere.build(2, 4, mesh_type="gllsubcell")
    fd = FaceDss.build(ms)
    if fd is not None:
        f = jnp.asarray(np.random.RandomState(0).rand(ms.ncell, ms.np2))
        ref = dss.dss_gather(f.reshape(-1), ms.dgll2cgll.reshape(-1),
                             ms.c2d_idx, ms.c2d_mask,
                             ms.dgbfi_gll.reshape(-1))
        np.testing.assert_allclose(np.asarray(fd.dss(f).reshape(-1)),
                                   np.asarray(ref), rtol=1e-13, atol=1e-15)
