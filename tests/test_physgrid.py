"""Physgrid tests: idempotence of FV -> GLL -> FV (the defining property of
IdemFv2Gll), mass conservation both directions, constant preservation, and
limiter bounds (cf. the standalone physgrid test program,
methods/slmm/physgrid.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from compose_tpu import driver
from compose_tpu.mesh import build
from compose_tpu.transport.physgrid import PhysgridOps


@pytest.fixture(scope="module")
def setup():
    mesh = build(4, 4)
    pg = PhysgridOps(mesh, nphys=2)
    rho = 1.0 + 0.1 * jnp.sin(3.0 * mesh.cell_nodes_xyz[..., 0]).reshape(
        mesh.ncell, mesh.np2)
    q = driver.init_tracers(mesh, ("cosinebells", "gaussianhills"))
    return mesh, pg, rho, q


def test_gll2fv_mass_conservation(setup):
    mesh, pg, rho, q = setup
    rho_p, q_p = pg.gll2fv(rho, q, limiter="none")
    m_gll = float(jnp.sum(mesh.dgbfi_gll * rho))
    m_fv = float(jnp.sum(pg.M_pp_j[None] * pg.fv_met * rho_p))
    assert abs(m_fv - m_gll) / abs(m_gll) < 2e-3  # lumped-vs-consistent mass
    # Tracer-mass consistency between definitions at the same tolerance.
    Qg = float(jnp.sum(mesh.dgbfi_gll[None] * q * rho[None]))
    Qf = float(jnp.sum((pg.M_pp_j[None] * pg.fv_met)[None] * q_p
                       * rho_p[None]))
    assert abs(Qf - Qg) / abs(Qg) < 2e-3


def test_fv_gll_fv_idempotent(setup):
    mesh, pg, rho, q = setup
    rho_p, q_p = pg.gll2fv(rho, q, limiter="none")
    rho_d, q_d = pg.fv2gll(rho_p, q_p, limiter="none")
    rho_p2, q_p2 = pg.gll2fv(rho_d, q_d, limiter="none")
    # The np-basis subcell integrals of the reconstruction must reproduce
    # the FV masses (exact when the basis reproduces degree npi-1).
    assert float(jnp.max(jnp.abs(rho_p2 - rho_p))) < 1e-11
    assert float(jnp.max(jnp.abs(q_p2 - q_p))) < 1e-10


def test_constant_preserved(setup):
    mesh, pg, rho, q = setup
    c = jnp.full_like(q[:1], 0.42)
    rho_p, c_p = pg.gll2fv(rho, c)
    assert float(jnp.max(jnp.abs(c_p - 0.42))) < 1e-12
    _, c_d = pg.fv2gll(rho_p, c_p)
    assert float(jnp.max(jnp.abs(c_d - 0.42))) < 1e-12


def test_limiter_bounds(setup):
    mesh, pg, rho, q = setup
    rho_p, q_p = pg.gll2fv(rho, q, limiter="caas")
    qmin = jnp.min(q, axis=-1)
    qmax = jnp.max(q, axis=-1)
    assert float(jnp.max(q_p - qmax[..., None])) < 1e-12
    assert float(jnp.min(q_p - qmin[..., None])) > -1e-12


@pytest.mark.parametrize("typ", ["l2", "l2ep", "elrecon"])
@pytest.mark.parametrize("nphys", [2, 3, 4])
def test_fv2gll_variants_constant_and_mass(typ, nphys):
    """All Fv2Gll variants (Fv2Gll::Type, slmmir_physgrid.hpp:56-68)
    reproduce constants exactly and conserve total element mass in
    reference coordinates."""
    mesh = build(3, 4)
    ops = PhysgridOps(mesh, nphys, typ)
    op = np.asarray(ops.op_p_to_d)
    nf2 = nphys * nphys
    d1 = op @ np.ones(nf2)
    assert np.abs(d1 - 1.0).max() < 1e-13
    rng = np.random.default_rng(0)
    p = rng.uniform(0.5, 2.0, nf2)
    d = op @ p
    m_fv = (4.0 / nf2) * p.sum()
    m_gll = (ops.w_dd * d).sum()
    assert abs(m_gll - m_fv) / m_fv < 1e-13


def test_fv2gll_l2ep_perimeter_mass():
    """l2ep's defining constraint: the intermediate reconstruction
    conserves each PERIMETER subcell's mass (slmmir_physgrid.cpp:460-487).
    With nphys=2 every subcell is perimeter, so the full GLL result's
    subcell masses match the FV input exactly."""
    mesh = build(3, 4)
    ops = PhysgridOps(mesh, 2, "l2ep")
    rng = np.random.default_rng(1)
    p = rng.uniform(0.5, 2.0, 4)
    d = np.asarray(ops.op_p_to_d) @ p
    sub = np.asarray(ops.M_dp).T @ d          # subcell integrals of d
    assert np.abs(sub - p).max() < 1e-12
