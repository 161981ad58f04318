"""Bit-for-bit (BFB) tree allreduce.

Counterpart of /root/reference/cedr/cedr_bfb_tree_allreduce.{hpp,cpp}: an
all-reduce whose summation order is fixed by a tree over the GLOBAL cell
space, so the result is bitwise invariant to the rank/device decomposition.
Accuracy contract vs a straight sum: |err| <= 2*log2(ncell)*eps*|sum|
(cedr_bfb_tree_allreduce.cpp:209-217).

On a single chip this is ops.reduce.bfb_sum. Across chips, each device
reduces its contiguous leaf block with the same global tree (the block
boundaries align with subtrees when ncell is padded to a power of two), then
a psum combines per-device partials in a fixed order - the combined order is
again a fixed function of global indices only.
"""

import jax
import jax.numpy as jnp

from ..ops.reduce import bfb_sum


def allreduce(x, axis: int = -1, axis_name=None):
    """Fixed-tree sum along `axis`; optionally completed by a psum over a
    mapped mesh axis. For decomposition invariance, pad the global array to a
    power of two and shard contiguous blocks (then each local bfb_sum is a
    subtree of the global tree and psum adds subtree roots in device order).
    """
    s = bfb_sum(x, axis=axis)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s
