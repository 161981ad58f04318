"""BFB tree allreduce invariance tests (the reference's BfbTreeAllReducer
contract, cedr_bfb_tree_allreduce.hpp:11-14 / .cpp:209-217): the same
global array, sharded into contiguous blocks over ndev in {1, 2, 4, 8}
devices, must reduce to the BITWISE-identical sum, equal to the
single-address-space bfb_sum; and the result must match a straight sum to
2*log2(n)*eps relative accuracy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from compose_tpu.cdr import bfb
from compose_tpu.ops.reduce import bfb_sum


def _distributed_sum(x, ndev):
    n = x.shape[-1]
    red = bfb.get_reducer(n, ndev)
    mesh = Mesh(jax.devices()[:ndev], ("cells",))

    def body(xb):
        return red.allreduce(xb, "cells")

    fn = jax.shard_map(body, mesh=mesh, in_specs=P("cells"),
                       out_specs=P(), check_vma=False)
    return fn(x)


@pytest.mark.parametrize("n", [1024, 5400, 96])
def test_allreduce_decomposition_invariant(n):
    # 5400 = ncell at ne30 (not a power of two); 96 = ne4.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(n) * 10.0 ** rng.integers(
        -8, 8, n))
    ref = float(bfb_sum(x))
    for ndev in (1, 2, 4, 8):
        if n % ndev:
            continue
        out = float(_distributed_sum(x, ndev))
        assert out == ref, (ndev, out, ref)
    # Accuracy contract vs a straight (compensated) sum.
    exact = float(np.sum(np.asarray(x, np.longdouble)))
    den = float(np.sum(np.abs(np.asarray(x))))
    assert abs(ref - exact) <= 2 * np.log2(n) * 2.22e-16 * den


def test_allreduce_batched():
    n, nt = 512, 3
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((nt, n)))
    ref = np.asarray(bfb_sum(x, axis=-1))
    red = bfb.get_reducer(n, 4)
    mesh = Mesh(jax.devices()[:4], ("cells",))
    fn = jax.shard_map(lambda xb: red.allreduce(xb, "cells"), mesh=mesh,
                       in_specs=P(None, "cells"), out_specs=P(),
                       check_vma=False)
    out = np.asarray(fn(x))
    assert (out == ref).all()


def test_adjacent_fold_subtree_property():
    """Contiguous power-of-two blocks are complete subtrees of the
    adjacent-pair tree: local fold + cross-fold reproduces the global sum
    bitwise, including for adversarial cancellation data (the fold-in-half
    pairing fails this: [1e16, 1, -1e16, 1])."""
    x = jnp.asarray([1e16, 1.0, -1e16, 1.0])
    assert float(bfb_sum(x)) == float(bfb_sum(x[:2]) + bfb_sum(x[2:]))
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.standard_normal(1024) * 10.0 ** rng.integers(
        -10, 10, 1024))
    whole = float(bfb_sum(y))
    quarters = bfb_sum(
        jnp.asarray([bfb_sum(y[i * 256:(i + 1) * 256]) for i in range(4)]))
    assert whole == float(quarters)


def test_segments_cover_and_align():
    for lo, hi in [(0, 7), (5, 13), (96, 192), (675, 1350), (0, 5400)]:
        segs = bfb._aligned_segments(lo, hi)
        cur = lo
        for j, p in segs:
            assert p * (1 << j) == cur
            assert p % 1 == 0
            cur += 1 << j
        assert cur == hi
