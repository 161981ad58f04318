"""Shape-preservation filters: global mass redistribution over cells.

Counterpart of /root/reference/methods/slmm/slmm_spf.{hpp,cpp}
(spf::MassRedistributor). Given per-cell data
    Q_data = (rho_mass, Q_min, Q_mass, Q_max)
and a global mass discrepancy `extra_mass`, produce per-cell target masses
`redistributed_mass` with
    sum(redistributed) == sum(Q_mass) + extra_mass
and (when feasible) Q_min <= redistributed_i <= Q_max.

Methods:
  caas - closed-form clip+proportional fill (slmm_spf.cpp:733-771,
         glbl_caas), one fused kernel; psum-ready for sharding.
  qlt  - log-depth tree redistribution. The reference sweeps the cubed-sphere
         face tree with up-to-4-kid node QPs (slmm_spf.cpp:552-699); here we
         reuse the CEDR QLT machinery (cdr/qlt.py) over a binary tree with
         the conserve+shapepreserve node solve, which satisfies the same
         contract (bounds when feasible, exact total, no change when
         feasible input) with level-batched array ops.
  mn2  - one n=ncell QP minimizing the l2 change (slmm_spf.cpp:701-721).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..cdr import qlt as qlt_mod
from ..ops import local_qp
from ..ops.reduce import bfb_sum


def record(F, rho, Q, q_min, q_max):
    """Per-cell reduction of nodal data to Q_data (slmm_spf.cpp:814-835).

    F, rho, Q: (..., ncell, np2); q_min, q_max: (..., ncell, np2) nodal
    bounds (for the scalar-bounds variant pass broadcasted arrays).
    Returns (rho_mass, Q_min, Q_mass, Q_max), each (..., ncell).
    """
    rhom = F * rho
    rho_mass = jnp.sum(rhom, axis=-1)
    Q_min = jnp.sum(rhom * q_min, axis=-1)
    Q_max = jnp.sum(rhom * q_max, axis=-1)
    Q_mass = jnp.sum(F * Q, axis=-1)
    return rho_mass, Q_min, Q_mass, Q_max


def glbl_caas_gsum(Q_min, Q_mass, Q_max, extra_mass, gsum):
    """Closed-form global CAAS (slmm_spf.cpp:733-771) with a caller-supplied
    global sum `gsum` (bfb_sum on one chip; the distributed BFB tree
    allreduce inside shard_map - cdr/bfb.py - which is bitwise equal). All
    per-cell arrays (..., ncell-block); extra_mass (...,)."""
    delta = jnp.where(Q_mass < Q_min, Q_min - Q_mass,
                      jnp.where(Q_mass > Q_max, Q_max - Q_mass, 0.0))
    m = extra_mass - gsum(delta)
    v_up = jnp.where(Q_mass >= Q_max, 0.0, Q_max - (Q_mass + delta))
    v_dn = jnp.where(Q_mass <= Q_min, 0.0, (Q_mass + delta) - Q_min)
    v = jnp.where((m > 0)[..., None], v_up, v_dn)
    vsum = gsum(v)
    fac = jnp.where(vsum != 0, m / jnp.where(vsum != 0, vsum, 1.0), 0.0)
    return Q_mass + delta + fac[..., None] * v


@partial(jax.jit, static_argnames=("axis_name",))
def glbl_caas(Q_min, Q_mass, Q_max, extra_mass, axis_name=None):
    """Single-address-space global CAAS (psum-completed when axis-mapped)."""

    def gsum(x):
        s = bfb_sum(x, axis=-1)
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
        return s

    return glbl_caas_gsum(Q_min, Q_mass, Q_max, extra_mass, gsum)


def run_mn2(Q_min, Q_mass, Q_max, extra_mass):
    """Global min-norm-2 redistribution (slmm_spf.cpp:701-721): one QP over
    all cells with unit weights."""
    ones = jnp.ones_like(Q_mass)
    b = bfb_sum(Q_mass, axis=-1) + extra_mass
    x, _ = local_qp.solve_1eq_bc_qp(
        ones, ones, b, Q_min, Q_max, Q_mass, max_its=100)
    return x


class MassRedistributor:
    """Stateful wrapper mirroring spf::MassRedistributor's record/
    redistribute/get_delta_mass flow, but functional under the hood."""

    def __init__(self, ncell: int, method: str = "caas"):
        self.ncell = ncell
        self.method = method
        if method == "qlt":
            # Shapepreserve-only leaves + a direct root-mass override (the
            # reference's root contract, slmm_spf.cpp:837-843); no conserve
            # (Qm_prev) channel is needed.
            self._qlt = qlt_mod.QLT(ncell,
                                    problem_type=qlt_mod.SHAPEPRESERVE)
        else:
            self._qlt = None

    def redistribute(self, rho_mass, Q_min, Q_mass, Q_max, extra_mass):
        """Returns per-cell redistributed masses.

        Batched: Q_min/Q_mass/Q_max may be (ncell,) or (nt, ncell) with
        extra_mass scalar or (nt,). rho_mass is (ncell,).
        """
        if self.method == "caas":
            return glbl_caas(Q_min, Q_mass, Q_max, extra_mass)
        if self.method == "mn2":
            return run_mn2(Q_min, Q_mass, Q_max, extra_mass)
        if self.method == "qlt":
            squeeze = Q_mass.ndim == 1
            Qm = jnp.atleast_2d(Q_mass)
            Qm_min = jnp.atleast_2d(Q_min)
            Qm_max = jnp.atleast_2d(Q_max)
            extra = jnp.broadcast_to(jnp.asarray(extra_mass), Qm.shape[:1])
            # Root-mass contract (slmm_spf.cpp:837-843): the tree solves
            # for root total = l2r-summed Q mass + extra; leaf channels are
            # untouched (no extra/ncell spread that could fake-saturate
            # leaf bounds).
            out = self._qlt.run(rho_mass, Qm, Qm_min, Qm_max,
                                root_extra=extra)
            return out[0] if squeeze else out
        raise ValueError(f"unknown spf method {self.method}")
