"""Cell-local limiters (MonoData equivalents), batched over all cells.

Counterpart of /root/reference/methods/slmm/slmmir_mono_data.{hpp,cpp}. The
reference loops cells and calls a per-cell QP; here every cell's limiter runs
in one vectorized call (the QP solvers in ops/local_qp.py broadcast over
leading axes). Limiter types: 'mn2' (solve_1eq_bc_qp), 'caas'
(clip_and_sum), 'caags' (clip_and_weighted_sum).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import local_qp


def _spf_run(limiter, w, a, b, xlo, xhi, y):
    if limiter == "mn2":
        x, _ = local_qp.solve_1eq_bc_qp(w, a, b, xlo, xhi, y)
        return x
    if limiter == "caas":
        return local_qp.clip_and_sum(a, b, xlo, xhi, y)
    if limiter == "caags":
        return local_qp.clip_and_weighted_sum(a, b, xlo, xhi, y)
    raise ValueError(f"unknown limiter {limiter}")


@partial(jax.jit, static_argnames=("limiter",))
def limit_density(F, rho, extra_mass, limiter: str = "mn2"):
    """Positivity limiter for density (slmmir_mono_data.cpp:66-105).

    F, rho: (ncell, np2); extra_mass: (ncell,) per-cell mass delta.
    Returns adjusted rho with rho >= 0 and
    sum(F*rho_out) == sum(F*rho_in) + extra_mass per cell.
    """
    mass_tgt = jnp.sum(rho * F, axis=-1) + extra_mass
    any_below = jnp.any(rho < 0, axis=-1)
    need = any_below | (extra_mass != 0)
    rho_clip = jnp.maximum(rho, 0.0)
    mass = jnp.sum(rho_clip * F, axis=-1)
    delta = mass_tgt - mass
    # delta >= 0: add a constant (linearly invariant).
    fac = delta / jnp.sum(F, axis=-1)
    rho_add = rho_clip + fac[..., None]

    # delta < 0: solve the nonneg QP with mn2 (reference hard-codes mn2
    # here). That's the rare branch (density staying near 0 globally); run
    # it under lax.cond so the common all-positive step skips the iterative
    # solve entirely.
    def qp_branch(_):
        zeros = jnp.zeros_like(rho)
        big = rho_clip + jnp.abs(mass_tgt)[..., None] + 1.0
        x_qp, _ = local_qp.solve_1eq_bc_qp(F, F, mass_tgt, zeros, big,
                                           rho_clip)
        return x_qp

    need_qp = jnp.any(need & (delta < 0))
    x_qp = jax.lax.cond(need_qp, qp_branch, lambda _: rho_add, None)
    out = jnp.where((delta >= 0)[..., None], rho_add, x_qp)
    return jnp.where(need[..., None], out, rho)


@partial(jax.jit, static_argnames=("limiter", "expand_bounds_allowed"))
def limit_tracer(F, rho, Q, q_min, q_max, Qm_extra,
                 limiter: str = "caas", expand_bounds_allowed: bool = False):
    """Bounds-preserving tracer-mass limiter with per-node bounds
    (slmmir_mono_data.cpp:299-361).

    F, rho, Q, q_min, q_max: (ncell, np2); Qm_extra: (ncell,).
    Solves per cell:
        min sum_i w_i (q_i - y_i)^2  s.t.  sum_i F_i rho_i q_i = Qm_tot,
        q_min_i <= q_i <= q_max_i
    with w = a = F*rho, y = Q/rho, Qm_tot = sum(F*Q) + Qm_extra,
    expanding bounds first if the cell problem is infeasible (and allowed).
    Returns adjusted Q.
    """
    rhom = rho * F                       # per-node masses
    rhom_tot = jnp.sum(rhom, axis=-1)
    Qm_tot = jnp.sum(Q * F, axis=-1) + Qm_extra
    Qm_min = jnp.sum(q_min * rhom, axis=-1)
    Qm_max = jnp.sum(q_max * rhom, axis=-1)

    lo = Qm_tot < Qm_min
    hi = Qm_tot > Qm_max
    if expand_bounds_allowed:
        q_min, q_max = _expand_bounds(
            rhom, q_min, q_max, Qm_tot - jnp.where(lo, Qm_min, Qm_max),
            lo, hi, rhom_tot)

    # Zero-density nodes carry no tracer mass; give them a vanishing but
    # nonzero QP weight so the solvers' a/w, w/a ratios stay finite (the
    # reference assumes rho > 0 at every node; under extreme divergence the
    # positivity limiter can produce exact zeros).
    tiny = 1e-300
    a = jnp.maximum(rhom, tiny)
    w = a
    y = Q / jnp.where(rho == 0, 1.0, rho)
    x = _spf_run(limiter, w, a, Qm_tot, q_min, q_max, y)
    return x * rho


def _expand_bounds(rhom, q_min, q_max, Qm_extra, lo, hi, rhom_tot):
    """Feasibility-restoring bound expansion (slmmir_mono_data.cpp:244-297),
    batched over cells. Only rows with lo|hi change."""
    act = lo | hi
    neg = lo  # Qm_extra < 0 corresponds to being under the min-bound sum
    q_bnd = jnp.where(neg[..., None], q_min, q_max)
    Qm = Qm_extra + jnp.sum(q_bnd * rhom, axis=-1)
    # Relaxed bound box for the bound-adjusting QP.
    all_min = jnp.min(q_min, axis=-1, keepdims=True)
    all_max = jnp.max(q_max, axis=-1, keepdims=True)
    q_bnd_min = jnp.where(neg[..., None],
                          jnp.broadcast_to(all_min, q_min.shape), q_min)
    q_bnd_max = jnp.where(neg[..., None], q_max,
                          jnp.broadcast_to(all_max, q_max.shape))
    Qm_lo = jnp.sum(q_bnd_min * rhom, axis=-1)
    Qm_hi = jnp.sum(q_bnd_max * rhom, axis=-1)
    feasible = (Qm_lo <= Qm) & (Qm <= Qm_hi)
    x_qp, _ = local_qp.solve_1eq_bc_qp(
        rhom, rhom, Qm, q_bnd_min, q_bnd_max, q_bnd)
    q_const = (Qm / rhom_tot)[..., None]
    new_bnd = jnp.where(feasible[..., None], x_qp,
                        jnp.broadcast_to(q_const, q_bnd.shape))
    q_min_out = jnp.where((act & neg)[..., None], new_bnd, q_min)
    q_max_out = jnp.where((act & ~neg)[..., None], new_bnd, q_max)
    return q_min_out, q_max_out
