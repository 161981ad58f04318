"""Bit-for-bit (BFB) tree allreduce.

Counterpart of /root/reference/cedr/cedr_bfb_tree_allreduce.{hpp,cpp}: an
all-reduce whose summation order is fixed by a binary tree over the GLOBAL
cell space, so the result is bitwise invariant to the rank/device
decomposition. Accuracy contract vs a straight sum:
|err| <= 2*log2(ncell)*eps*|sum| (cedr_bfb_tree_allreduce.cpp:209-217).

On a single chip this is ops.reduce.bfb_sum (adjacent-pair fold over the
zero-padded power-of-two index space). Across chips the tree is SPLIT, not
re-derived: each device owns a contiguous leaf block, which decomposes into
O(log P) maximal aligned subtrees of the global tree; the device reduces
each subtree exactly as the global fold would (its partials are therefore
bitwise equal to interior node values of the global tree), one small
`all_gather` ships every device's partials everywhere, and a statically
precomputed straight-line plan performs the REMAINING tree adds - the same
adds, in the same association, as the single-chip fold. Communication is
O(ndev * log ncell) scalars per reduced quantity instead of O(ncell) (the
reference ships one message per rank per tree level,
cedr_bfb_tree_allreduce.cpp:79-159).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.reduce import bfb_sum, _next_pow2


def _aligned_segments(lo: int, hi: int):
    """Decompose [lo, hi) into maximal subtree-aligned segments of the
    adjacent-pair tree: each segment is [p*2^j, (p+1)*2^j) with maximal j.
    Returns [(level j, pos p)] in left-to-right order."""
    segs = []
    while lo < hi:
        j = (lo & -lo).bit_length() - 1 if lo else (hi - 1).bit_length()
        while (1 << j) > hi - lo:
            j -= 1
        segs.append((j, lo >> j))
        lo += 1 << j
    return segs


class BfbTreeAllReducer:
    """Distributed completion of bfb_sum for contiguous block sharding of
    n leaves over n_shards devices.

    Ragged n (not divisible by n_shards) is supported: the block is
    B = ceil(n / n_shards), the last shard's trailing pad slots must hold
    ZEROS (they land on the global tree's zero-padding leaves), and the
    result stays bitwise equal to bfb_sum on the global array."""

    def __init__(self, n: int, n_shards: int, block: int = None,
                 leaf_lists=None):
        self.n = n
        self.n_shards = n_shards
        P = _next_pow2(n)
        self.P = P
        m = P.bit_length() - 1
        if leaf_lists is None:
            # Contiguous blocks. An explicit block supports derived index
            # spaces whose padding is inherited (e.g. DGLL slots = padded
            # cells * np2: the slot block is cell_block * np2, not
            # ceil(n_slots / n_shards)).
            B = -(-n // n_shards) if block is None else block
            self.block = B
            assert (n_shards - 1) * B < n, (n, n_shards, B)  # no empty shard
            # local_partials writes [s*B, s*B + B) into the P-leaf space;
            # the pad tail [n, n_shards*B) carries zeros and must fit.
            assert n_shards * B <= P, (n, n_shards, P)
            # Per-shard maximal aligned segments of its block (clipped to
            # n; leaves in [n, P) are padding zeros, contribute nothing).
            seg_lists = [_aligned_segments(s * B, min((s + 1) * B, n))
                         for s in range(n_shards)]
            self._pos_tab = None
        else:
            # Scattered leaves (e.g. a 2-D face-tile layout): shard s owns
            # the sorted global leaf list leaf_lists[s] (a partition of
            # [0, n)); its block is the list padded to B, and its aligned
            # segments are those of each maximal run of consecutive ids.
            # The tree stays the canonical one, so results remain bitwise
            # equal to bfb_sum / any other decomposition.
            assert len(leaf_lists) == n_shards
            B = max(len(l) for l in leaf_lists) if block is None else block
            self.block = B
            seg_lists = []
            pos_tab = np.full((n_shards, B), P, np.int32)  # P = drop slot
            for s, leaves in enumerate(leaf_lists):
                leaves = np.asarray(leaves, np.int64)
                assert len(leaves) >= 1 and len(leaves) <= B
                assert (np.diff(leaves) > 0).all(), "sorted, unique"
                pos_tab[s, :len(leaves)] = leaves
                # Maximal runs of consecutive global ids.
                brk = np.nonzero(np.diff(leaves) != 1)[0] + 1
                segs = []
                for run in np.split(leaves, brk):
                    segs.extend(_aligned_segments(int(run[0]),
                                                  int(run[-1]) + 1))
                seg_lists.append(segs)
            self._pos_tab = jnp.asarray(pos_tab)
        self.max_nseg = max(len(s) for s in seg_lists)
        # Pyramid layout: levels j = 0..m concatenated; offsets[j] is the
        # start of level j (level j has P >> j entries).
        offsets = []
        off = 0
        for j in range(m + 1):
            offsets.append(off)
            off += P >> j
        # flat_idx[s, i]: where shard s's i-th segment partial lives in its
        # local pyramid (padding slots point at 0; the plan never reads
        # them).
        self.flat_idx = np.zeros((n_shards, self.max_nseg), np.int32)
        node_src = {}
        for s, segs in enumerate(seg_lists):
            for i, (j, p) in enumerate(segs):
                self.flat_idx[s, i] = offsets[j] + p
                node_src[(j, p)] = (s, i)
        # Completion plan: the remaining adds of the global fold, bottom-up.
        # Each op is (dst_node, src_a or None, src_b or None) where a src of
        # None is a padding (all-zero) subtree - added as literal 0.0 to
        # reproduce bfb_sum bitwise (incl. -0.0 + 0.0 = +0.0).
        self.plan = []
        nodes = dict(node_src)  # (j, p) -> slot key
        for j in range(m):
            level = sorted(p for (jj, p) in nodes if jj == j)
            done = set()
            for p in level:
                if p in done:
                    continue
                sib = p ^ 1
                done.update((p, sib))
                a = nodes.pop((j, p))
                b = nodes.pop((j, sib), None)
                if b is None:
                    # The sibling subtree must be entirely padding.
                    assert sib * (1 << j) >= n, (j, p, sib, n)
                left, right = (a, b) if p % 2 == 0 else (b, a)
                key = ("node", j + 1, p >> 1)
                nodes[(j + 1, p >> 1)] = key
                self.plan.append((key, left, right))
        assert list(nodes) == [(m, 0)], nodes
        self._root_key = nodes[(m, 0)]
        self._jnp_flat_idx = jnp.asarray(self.flat_idx)

    # ------------------------------------------------------------------
    def local_partials(self, x_block, shard_index):
        """Inside shard_map: reduce this device's block to its aligned
        subtree partials, (..., max_nseg). `shard_index` is the traced
        axis index."""
        B = x_block.shape[-1]
        assert B == self.block, (B, self.block)
        shape = x_block.shape[:-1] + (self.P,)
        w = jnp.zeros(shape, x_block.dtype)
        if self._pos_tab is None:
            start = (jnp.zeros((), jnp.int32),) * (x_block.ndim - 1) + (
                (shard_index * B).astype(jnp.int32),)
            w = jax.lax.dynamic_update_slice(w, x_block, start)
        else:
            # Scattered leaves: place each local value at its global leaf
            # position (pad slots point at P and are dropped).
            w = w.at[..., self._pos_tab[shard_index]].set(
                x_block, mode="drop")
        levels = [w]
        while w.shape[-1] > 1:
            w = w[..., 0::2] + w[..., 1::2]
            levels.append(w)
        pyr = jnp.concatenate(levels, axis=-1)
        return pyr[..., self._jnp_flat_idx[shard_index]]

    def complete(self, gathered):
        """Run the static completion plan on gathered partials
        (..., n_shards, max_nseg). Returns the root sum (...,). Identical
        on every shard (the plan reads only (shard, seg) slots that carry
        real subtree values)."""
        vals = {}
        for s in range(self.n_shards):
            for i in range(self.max_nseg):
                vals[(s, i)] = gathered[..., s, i]
        zero = jnp.zeros(gathered.shape[:-2], gathered.dtype)
        for dst, a, b in self.plan:
            va = vals[a] if a is not None else zero
            vb = vals[b] if b is not None else zero
            vals[dst] = va + vb
        return vals[self._root_key]

    def allreduce(self, x_block, axis_name):
        """Full distributed BFB sum: call inside shard_map with the block
        of the global array this device owns (last axis). Returns the
        global tree sum, bitwise equal to bfb_sum(global x) and to every
        other decomposition's result."""
        s = jax.lax.axis_index(axis_name)
        part = self.local_partials(x_block, s)
        gathered = jax.lax.all_gather(part, axis_name,
                                      axis=part.ndim - 1)
        # all_gather inserts the device axis before the seg axis:
        # (..., n_shards, max_nseg).
        return self.complete(gathered)


@lru_cache(maxsize=None)
def get_reducer(n: int, n_shards: int,
                block: int = None) -> BfbTreeAllReducer:
    return BfbTreeAllReducer(n, n_shards, block)


def allreduce(x, axis: int = -1, axis_name=None):
    """Fixed-tree sum along `axis`. With axis_name=None this is the plain
    single-address-space bfb_sum; the decomposition-invariant distributed
    form is BfbTreeAllReducer.allreduce inside shard_map."""
    s = bfb_sum(x, axis=axis)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s
