"""spf.MassRedistributor tests (slmm_spf.cpp): the redistribution contract
(exact total = sum(Q_mass) + extra, bounds when feasible, no change for
feasible zero-extra input) for caas / qlt / mn2, including the qlt
root-mass contract (root total = l2r tree sum + extra,
slmm_spf.cpp:837-843) at the bound-saturation edge."""

import numpy as np
import jax.numpy as jnp
import pytest

from compose_tpu.ops.reduce import bfb_sum
from compose_tpu.transport import spf


def _random_problem(ncell, rng, feasible=True):
    rho_mass = rng.uniform(0.5, 1.5, ncell)
    q_min = rng.uniform(0.0, 0.4, ncell)
    q_max = q_min + rng.uniform(0.2, 0.6, ncell)
    Q_min = rho_mass * q_min
    Q_max = rho_mass * q_max
    t = rng.uniform(-0.2, 1.2, ncell)
    Q = Q_min + t * (Q_max - Q_min)       # some cells out of bounds
    return rho_mass, Q_min, Q, Q_max


@pytest.mark.parametrize("method", ["caas", "qlt", "mn2"])
@pytest.mark.parametrize("ncell", [96, 101])
def test_redistribute_contract(method, ncell):
    rng = np.random.default_rng(7)
    rho_mass, Q_min, Q, Q_max = _random_problem(ncell, rng)
    extra = 0.01 * float(Q.sum())
    mrd = spf.MassRedistributor(ncell, method)
    out = np.asarray(mrd.redistribute(
        jnp.asarray(rho_mass), jnp.asarray(Q_min), jnp.asarray(Q),
        jnp.asarray(Q_max), extra))
    tot_in = float(bfb_sum(jnp.asarray(Q))) + extra
    assert abs(out.sum() - tot_in) < 1e-12 * abs(tot_in)
    # extra is small and there is headroom: bounds must hold.
    assert (out - Q_min).min() > -1e-12
    assert (Q_max - out).min() > -1e-12


@pytest.mark.parametrize("method", ["caas", "qlt", "mn2"])
def test_no_change_when_feasible(method):
    """Zero extra mass + in-bounds input => output equals input (the
    reference's no-change guarantee; cedr_qlt_inl.hpp:145-159)."""
    ncell = 64
    rng = np.random.default_rng(3)
    rho_mass = rng.uniform(0.5, 1.5, ncell)
    Q_min = rho_mass * 0.1
    Q_max = rho_mass * 0.9
    Q = rho_mass * rng.uniform(0.2, 0.8, ncell)
    mrd = spf.MassRedistributor(ncell, method)
    out = np.asarray(mrd.redistribute(
        jnp.asarray(rho_mass), jnp.asarray(Q_min), jnp.asarray(Q),
        jnp.asarray(Q_max), 0.0))
    assert np.abs(out - Q).max() < 1e-13


def test_qlt_root_mass_contract_at_saturation():
    """Near-saturation stress for the qlt root-mass contract: every cell
    sits exactly at its upper bound except one with headroom. The extra
    mass must flow to the single cell with headroom and no leaf may
    exceed its bound (the old extra/ncell leaf spread pushed every
    leaf's conserve channel above Q_max before the solve)."""
    ncell = 128
    rng = np.random.default_rng(11)
    rho_mass = rng.uniform(0.5, 1.5, ncell)
    Q_min = np.zeros(ncell)
    Q_max = rho_mass.copy()
    Q = Q_max.copy()                       # saturated at the top...
    Q[17] = 0.5 * Q_max[17]                # ...except one cell
    headroom = Q_max[17] - Q[17]
    extra = 0.5 * headroom
    mrd = spf.MassRedistributor(ncell, "qlt")
    out = np.asarray(mrd.redistribute(
        jnp.asarray(rho_mass), jnp.asarray(Q_min), jnp.asarray(Q),
        jnp.asarray(Q_max), extra))
    tot_in = float(bfb_sum(jnp.asarray(Q))) + extra
    assert abs(out.sum() - tot_in) < 1e-12 * abs(tot_in)
    assert (Q_max - out).min() > -1e-12, "leaf pushed beyond Q_max"
    # All the extra landed in cell 17.
    assert abs(out[17] - (Q[17] + extra)) < 1e-10


def test_qlt_batched_tracers():
    ncell, nt = 96, 5
    rng = np.random.default_rng(5)
    rho_mass = rng.uniform(0.5, 1.5, ncell)
    Q_min = np.zeros((nt, ncell))
    Q_max = np.broadcast_to(rho_mass, (nt, ncell)).copy()
    Q = rho_mass * rng.uniform(0.2, 0.8, (nt, ncell))
    extra = 0.01 * Q.sum(axis=-1)
    mrd = spf.MassRedistributor(ncell, "qlt")
    out = np.asarray(mrd.redistribute(
        jnp.asarray(rho_mass), jnp.asarray(Q_min), jnp.asarray(Q),
        jnp.asarray(Q_max), jnp.asarray(extra)))
    for t in range(nt):
        tot = float(bfb_sum(jnp.asarray(Q[t]))) + extra[t]
        assert abs(out[t].sum() - tot) < 1e-12 * abs(tot)
    assert (out - Q_min).min() > -1e-12
    assert (Q_max - out).min() > -1e-12
