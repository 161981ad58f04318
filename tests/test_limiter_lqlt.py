"""Local tensor-2d QLT limiter tests (slmm_spf_lqlt.cpp /
slmm_array_tree.cpp): mass equality + bounds on random feasible problems,
tree structural invariants, and the no-tree fallback."""

import numpy as np
import jax.numpy as jnp
import pytest

from compose_tpu.transport import limiter as limiter_mod


@pytest.mark.parametrize("np_", [4, 7, 8, 10, 11, 12, 13, 16])
def test_tree_covers_dofs_once(np_):
    tree = limiter_mod._get_lqlt_tree(np_)
    assert tree is not None
    memb = np.asarray(tree.memb)
    # Root covers every DOF exactly once (covered_once,
    # slmm_array_tree.cpp:133-141).
    assert np.all(memb[0] == 1.0)
    # Leaves partition the DOFs.
    leaf_cover = np.zeros(np_ * np_)
    for leaf_ids, dof_ids in tree.leaf_groups:
        for dofs in dof_ids:
            leaf_cover[dofs] += 1
    assert np.all(leaf_cover == 1.0)


@pytest.mark.parametrize("np_", [4, 8, 16, 3])
def test_lqlt_mass_and_bounds(np_):
    """Random feasible problems: exact mass, bounds to roundoff (np_=3 has
    no tree table and exercises the plain-QP fallback,
    slmm_spf_lqlt.cpp:149-155)."""
    np2 = np_ * np_
    rng = np.random.default_rng(0)
    B = 193
    a = rng.uniform(0.5, 2.0, (B, np2))
    xlo = rng.uniform(0.0, 0.4, (B, np2))
    xhi = xlo + rng.uniform(0.1, 0.6, (B, np2))
    t = rng.uniform(0.1, 0.9, (B,))
    b = (a * (xlo + t[:, None] * (xhi - xlo))).sum(-1)
    y = rng.uniform(-0.2, 1.2, (B, np2))
    x = np.asarray(limiter_mod._local_qlt_tensor2d(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(xlo), jnp.asarray(xhi),
        jnp.asarray(y)))
    mass_rel = np.abs((a * x).sum(-1) - b) / np.abs(b)
    assert mass_rel.max() < 1e-12
    assert np.maximum(0, xlo - x).max() < 1e-12
    assert np.maximum(0, x - xhi).max() < 1e-12


def test_lqlt_no_change_when_feasible_input():
    """If y already satisfies bounds and mass, the limiter should return it
    (to solver tolerance)."""
    np_ = 4
    np2 = np_ * np_
    rng = np.random.default_rng(1)
    B = 31
    a = rng.uniform(0.5, 2.0, (B, np2))
    y = rng.uniform(0.3, 0.7, (B, np2))
    xlo = y - 0.2
    xhi = y + 0.2
    b = (a * y).sum(-1)
    x = np.asarray(limiter_mod._local_qlt_tensor2d(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(xlo), jnp.asarray(xhi),
        jnp.asarray(y)))
    assert np.abs(x - y).max() < 1e-10
