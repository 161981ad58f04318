"""Randomized CDR battery, ported from the reference's key acceptance test
(/root/reference/cedr/cedr_test_randomized.cpp): 6 problem types x 6
perturbation types, with the reference's exact tolerances:
  - local bounds: 0 tolerance (3 ulp in the safety-relaxed global check)
  - no-change: bitwise equality when perturbation == 0
  - global mass: rel err <= 1e2*eps with sum|Qm_prev| denominator.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from compose_tpu.cdr import caas, qlt
from compose_tpu.cdr.qlt import (
    CONSERVE, CONSISTENT, NONNEGATIVE, SHAPEPRESERVE)

EPS = np.finfo(np.float64).eps

PTS = [
    CONSERVE | SHAPEPRESERVE | CONSISTENT,
    SHAPEPRESERVE,
    CONSERVE | CONSISTENT,
    CONSISTENT,
    NONNEGATIVE,
    NONNEGATIVE | CONSERVE,
]


class Tracer:
    def __init__(self, problem_type, perturb, idx):
        self.problem_type = problem_type
        self.perturbation_type = perturb
        self.idx = idx
        sp = problem_type & SHAPEPRESERVE
        nn = problem_type & NONNEGATIVE
        self.no_change_should_hold = perturb == 0
        self.local_should_hold = perturb < 4 and (sp or nn)
        self.safe_should_hold = True


def make_tracers():
    out = []
    idx = 0
    for perturb in range(6):
        for pt in PTS:
            out.append(Tracer(pt, perturb, idx))
            idx += 1
    return out


def generate(rng, n, tracers):
    rhom = 0.5 * (1 + rng.random(n))
    data = {}
    for t in tracers:
        if t.problem_type & NONNEGATIVE:
            if t.no_change_should_hold:
                Qm = rng.random(n)
            else:
                Qm = np.where(np.arange(n) % 2 == 0, 0.75, -0.75) + rng.random(n)
            Qm_min = np.zeros(n)
            Qm_max = np.full(n, 10.0)
        else:
            q_min = -0.75 + rng.random(n)
            q_max = q_min + rng.random(n)
            q = q_min + (q_max - q_min) * rng.random(n)
            Qm_min = q_min * rhom
            Qm_max = q_max * rhom
            Qm = np.clip(q * rhom, Qm_min, Qm_max)
        data[t.idx] = dict(Qm=Qm, Qm_min=Qm_min, Qm_max=Qm_max,
                           Qm_prev=Qm.copy())
    return rhom, data


def perturb(rng, t, rhom, d, ncells):
    # cedr_test_randomized.cpp:120-199.
    cm = not (t.problem_type & CONSERVE)
    edg = 1 - ncells * EPS
    p = t.perturbation_type

    def permute(x):
        pi = np.arange(ncells)
        for _ in range(ncells):
            j, k = rng.integers(0, ncells, 2)
            pi[j], pi[k] = pi[k], pi[j]
        return x[pi]

    if p == 0:
        return
    if p == 1:
        d['Qm'] = permute(d['Qm'])
        return
    alpha = 0.5 if p in (2, 4) else edg
    safety = p >= 4
    rm, Qm, Qm_max = rhom.sum(), d['Qm'].sum(), d['Qm_max'].sum()
    if safety:
        Qm_max_safety = np.max(d['Qm_max'] / rhom) * rm
        dQm = ((Qm_max - Qm) + alpha * (Qm_max_safety - Qm_max)) / ncells
    else:
        dQm = alpha * (Qm_max - Qm) / ncells
    d['Qm'] = permute(d['Qm'] + dQm)
    relax = 0.9
    if cm:
        dQm_prev = dQm
    elif safety:
        dQm_prev = ((Qm_max - Qm) + relax * alpha
                    * (Qm_max_safety - Qm_max)) / ncells
    else:
        dQm_prev = relax * alpha * (Qm_max - Qm) / ncells
    d['Qm_prev'] = d['Qm_prev'] + dQm_prev


def check(tracers, rhom, data, out):
    # cedr_test_randomized.cpp:293-418.
    nerr = 0
    ulp3 = 3 * EPS
    for t in tracers:
        d = data[t.idx]
        Qm = out[t.idx]
        nonneg = t.problem_type & NONNEGATIVE
        if t.local_should_hold:
            if nonneg:
                bad = Qm < 0
            else:
                bad = (Qm < d['Qm_min']) | (Qm > d['Qm_max'])
            if bad.any():
                viol = np.where(Qm < d['Qm_min'], Qm - d['Qm_min'],
                                Qm - d['Qm_max'])
                print(f"local bounds FAIL t{t.idx} pt={t.problem_type} "
                      f"perturb={t.perturbation_type} "
                      f"max viol {np.abs(viol[bad]).max():.3e}")
                nerr += 1
        else:
            # Safety (global-range) bounds.
            if nonneg:
                bad = Qm < -ulp3
            else:
                q_min = np.min(d['Qm_min'] / rhom)
                q_max = np.max(d['Qm_max'] / rhom)
                delta = (q_max - q_min) * ulp3
                bad = ((Qm < q_min * rhom - delta)
                       | (Qm > q_max * rhom + delta))
            if bad.any():
                print(f"safety bounds FAIL t{t.idx} pt={t.problem_type} "
                      f"perturb={t.perturbation_type}")
                nerr += 1
        if t.no_change_should_hold and not np.array_equal(Qm, d['Qm_prev']):
            print(f"no-change FAIL t{t.idx} pt={t.problem_type} "
                  f"max diff {np.abs(Qm - d['Qm_prev']).max():.3e}")
            nerr += 1
        rd = (abs(Qm.sum() - d['Qm_prev'].sum())
              / np.abs(d['Qm_prev']).sum())
        if rd > 1e2 * EPS:
            print(f"mass FAIL t{t.idx} pt={t.problem_type} "
                  f"perturb={t.perturbation_type} rd={rd:.3e}")
            nerr += 1
    return nerr


@pytest.mark.parametrize("ncells,imbalanced", [(11, False), (111, False),
                                               (111, True), (64, False)])
def test_qlt_randomized(ncells, imbalanced):
    rng = np.random.default_rng(42 + ncells)
    tracers = make_tracers()
    rhom, data = generate(rng, ncells, tracers)
    for t in tracers:
        perturb(rng, t, rhom, data[t.idx], ncells)
    out = {}
    # Group tracers by problem type (one QLT call per type, tracers batched).
    for pt in PTS:
        group = [t for t in tracers if t.problem_type == pt]
        solver = qlt.QLT(ncells, problem_type=pt, imbalanced_tree=imbalanced)
        Qm = jnp.asarray(np.stack([data[t.idx]['Qm'] for t in group]))
        Qm_min = jnp.asarray(np.stack([data[t.idx]['Qm_min'] for t in group]))
        Qm_max = jnp.asarray(np.stack([data[t.idx]['Qm_max'] for t in group]))
        Qm_prev = jnp.asarray(np.stack([data[t.idx]['Qm_prev'] for t in group]))
        res = np.asarray(solver.run(jnp.asarray(rhom), Qm, Qm_min, Qm_max,
                                    Qm_prev))
        for k, t in enumerate(group):
            out[t.idx] = res[k]
    assert check(tracers, rhom, data, out) == 0


@pytest.mark.parametrize("ncells", [11, 111])
def test_caas_randomized(ncells):
    rng = np.random.default_rng(7 + ncells)
    tracers = [t for t in make_tracers()
               if (t.problem_type & SHAPEPRESERVE) and t.local_should_hold]
    rhom, data = generate(rng, ncells, tracers)
    for t in tracers:
        perturb(rng, t, rhom, data[t.idx], ncells)
    out = {}
    for conserve in (False, True):
        group = [t for t in tracers
                 if bool(t.problem_type & CONSERVE) == conserve]
        if not group:
            continue
        Qm = jnp.asarray(np.stack([data[t.idx]['Qm'] for t in group]))
        Qm_min = jnp.asarray(np.stack([data[t.idx]['Qm_min'] for t in group]))
        Qm_max = jnp.asarray(np.stack([data[t.idx]['Qm_max'] for t in group]))
        prev = (jnp.asarray(np.stack([data[t.idx]['Qm_prev'] for t in group]))
                if conserve else None)
        res = np.asarray(caas.run(Qm, Qm_min, Qm_max, Qm_prev=prev))
        for k, t in enumerate(group):
            out[t.idx] = res[k]
    assert check(tracers, rhom, data, out) == 0


@pytest.mark.parametrize("ndev,ncells,decomp", [
    (2, 112, "contig"), (8, 112, "contig"),
    # The reference's cedr-test-unit-mpi fixture: 111 cells on 8 ranks -
    # ragged (non-divisible) blocks, and the pseudorandom cell->rank map
    # that "forces the QLT tree to communicate, pack, and unpack in silly
    # ways" (cedr/CMakeLists.txt:14-16, cedr_tree.hpp:128-138,
    # cedr_tree.cpp:366-375).
    (8, 111, "contig"), (8, 111, "pseudorandom"),
], ids=["div2", "div8", "ragged8", "procrandom8"])
def test_qlt_randomized_sharded(ndev, ncells, decomp):
    """The full 6-type x 6-perturbation battery through the SHARDED QLT
    (incl. the dynamic-range consistent-only types - VERDICT r3 #5, the
    cedr-test-unit-mpi analogue, cedr_qlt.cpp:745-798): every type must
    reproduce the single-chip QLT bitwise for contiguous (divisible and
    ragged) and pseudorandom decompositions and pass the reference's
    checks."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from compose_tpu.cdr.qlt_sharded import ShardedQLT

    assert len(jax.devices()) >= ndev
    rng = np.random.default_rng(42 + ncells)
    tracers = make_tracers()
    rhom, data = generate(rng, ncells, tracers)
    for t in tracers:
        perturb(rng, t, rhom, data[t.idx], ncells)
    owner = None
    if decomp == "pseudorandom":
        owner = rng.integers(0, ndev, ncells)
        for s in range(ndev):          # every shard needs >= 1 leaf
            if not (owner == s).any():
                owner[rng.integers(0, ncells)] = s
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("cells",))
    out = {}
    for pt in PTS:
        group = [t for t in tracers if t.problem_type == pt]
        solver = qlt.QLT(ncells, problem_type=pt)
        Qm = jnp.asarray(np.stack([data[t.idx]['Qm'] for t in group]))
        Qm_min = jnp.asarray(np.stack([data[t.idx]['Qm_min'] for t in group]))
        Qm_max = jnp.asarray(np.stack([data[t.idx]['Qm_max'] for t in group]))
        Qm_prev = jnp.asarray(np.stack([data[t.idx]['Qm_prev']
                                        for t in group]))
        ref = np.asarray(solver.run(jnp.asarray(rhom), Qm, Qm_min, Qm_max,
                                    Qm_prev))
        sq = ShardedQLT(ncells, ndev, problem_type=pt, owner=owner)
        # Leaf-slot layout (scatter_leaves is the identity for the
        # divisible contiguous case). Dynamic-range types divide by rhom,
        # so its pad slots carry 1.0.
        rb = sq.scatter_leaves(jnp.asarray(rhom), fill=1.0)
        Qb, Qnb, Qxb, Qpb = (sq.scatter_leaves(x)
                             for x in (Qm, Qm_min, Qm_max, Qm_prev))
        f = jax.jit(jax.shard_map(
            lambda rr, q, qn, qx, qp: sq.run(rr, q, qn, qx, Qm_prev=qp),
            mesh=mesh,
            in_specs=(P("cells"), P(None, "cells"), P(None, "cells"),
                      P(None, "cells"), P(None, "cells")),
            out_specs=P(None, "cells"), check_vma=False))
        res = np.asarray(sq.gather_leaves(f(rb, Qb, Qnb, Qxb, Qpb)))
        assert (res == ref).all(), f"problem type {pt} not bitwise"
        for k, t in enumerate(group):
            out[t.idx] = res[k]
    assert check(tracers, rhom, data, out) == 0
