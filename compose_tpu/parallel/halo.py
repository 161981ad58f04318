"""CFL-bounded halo exchange for the ISL departure gather.

The reference observes that the semi-Lagrangian footprint is spatially
local: "max_hits = 25 ... covers at least a 2-halo"
(/root/reference/methods/slmm/slmmir_remapper.cpp:7). Under GSPMD the
departure read `q[:, ci, :]` cannot be proven local, so XLA all-gathers the
FULL tracer state to every chip - O(area) communication. This module builds
the O(perimeter) alternative:

  - cells are block-sharded along their linear index over the device axis;
  - for every shard, the cells OTHER shards may read (its "send set") and
    the remote cells it may read (its "halo") are computed statically from
    the mesh topology and a halo depth in rings (2 rings covers CFL <~ 1
    per the reference; deeper CFL = more rings, still static);
  - at runtime one `all_gather` of the PADDED BOUNDARY BLOCK (identical
    size on every shard) moves only perimeter cells over ICI;
  - a static remap table turns global source-cell ids into indices into
    [local block | halo buffer], so the gather itself stays local.

Exchanged volume per chip: O(boundary * rings) instead of O(ncell) - the
design contract of SURVEY.md §2.5 (halo exchange over ICI). The functions
here run inside `jax.shard_map` over a 1-D 'cells' device axis and are
validated bitwise against the unsharded gather on a virtual device mesh
(tests/test_sharding.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cell_rings(mesh, depth: int):
    """Per-cell neighbor sets up to `depth` rings (corner adjacency)."""
    ncell = mesh.ncell
    ne = mesh.ne
    f, iy, ix = np.unravel_index(np.arange(ncell), (6, ne, ne))
    gx = np.stack([ix, ix + 1, ix + 1, ix], -1).astype(np.int64)
    gy = np.stack([iy, iy, iy + 1, iy + 1], -1).astype(np.int64)
    from ..mesh.cubed_sphere import _face_key
    keys = np.empty((ncell, 4, 3), np.int64)
    for ff in range(6):
        sel = f == ff
        keys[sel] = _face_key(ff, 2 * gx[sel] - ne, 2 * gy[sel] - ne, ne)
    _, vinv = np.unique(keys.reshape(-1, 3), axis=0, return_inverse=True)
    vinv = vinv.reshape(ncell, 4)
    v2c = {}
    for c in range(ncell):
        for k in range(4):
            v2c.setdefault(vinv[c, k], []).append(c)
    ring = [set([c]) for c in range(ncell)]
    for _ in range(depth):
        new = [set(r) for r in ring]
        for c in range(ncell):
            for c1 in ring[c]:
                for k in range(4):
                    new[c].update(v2c[vinv[c1, k]])
        ring = new
    return ring


class HaloMaps:
    """Static send/recv/remap tables for one (mesh, n_shards, depth)."""

    def __init__(self, mesh, n_shards: int, depth: int = 2):
        ncell = mesh.ncell
        assert ncell % n_shards == 0, (ncell, n_shards)
        B = ncell // n_shards
        self.n_shards = n_shards
        self.block = B
        self.depth = depth
        owner = np.arange(ncell) // B
        rings = _cell_rings(mesh, depth)

        # Shard s needs remote cell c iff c is within `depth` rings of one
        # of s's cells. Equivalently: for cell c, the shards of ring(c).
        need = [set() for _ in range(n_shards)]      # remote cells per shard
        send = [set() for _ in range(n_shards)]      # local cells others need
        for c in range(ncell):
            oc = owner[c]
            for c1 in rings[c]:
                if owner[c1] != oc:
                    need[oc].add(c1)
                    send[owner[c1]].add(c1)

        # One padded boundary block per shard, all_gathered over the axis
        # (legacy layout, kept for the GSPMD-era tests).
        max_send = max(len(s) for s in send)
        self.send_idx = np.zeros((n_shards, max_send), np.int32)  # local ids
        for s in range(n_shards):
            ids = sorted(send[s])
            loc = [c - s * B for c in ids]
            pad = max_send - len(loc)
            self.send_idx[s, :len(loc)] = loc
            if pad:
                self.send_idx[s, len(loc):] = loc[0] if loc else 0
        self.max_send = max_send

        # --- Neighbor-wise point-to-point exchange (the design SURVEY §7
        # stage 7 / the reference's one-message-per-rank-pair contract,
        # cedr_tree.cpp:185-213): for each ordered shard pair (src -> dst)
        # the cells dst needs from src. Executed as one `ppermute` round
        # per occurring shard-offset delta d (dst = src + d): every shard
        # sends its per-delta buffer (padded to that delta's max size), so
        # per-chip exchanged volume is sum_d size_d ~ O(own perimeter) -
        # independent of n_shards - instead of the all_gather's
        # n_shards * max_send.
        pair = {}               # (src, dst) -> sorted cell list
        for dst in range(n_shards):
            by_src = {}
            for c in sorted(need[dst]):
                by_src.setdefault(owner[c], []).append(c)
            for src, cells in by_src.items():
                pair[(src, dst)] = cells
        deltas = sorted({(dst - src) % n_shards for (src, dst) in pair})
        self.deltas = deltas
        self.pair_sizes = []
        self.pair_send_idx = []  # per delta: (n_shards, size_d) local ids
        for d in deltas:
            size_d = max((len(pair.get((s, (s + d) % n_shards), []))
                          for s in range(n_shards)), default=0)
            tab = np.zeros((n_shards, size_d), np.int32)
            for s in range(n_shards):
                cells = pair.get((s, (s + d) % n_shards), [])
                loc = [c - s * B for c in cells]
                tab[s, :len(loc)] = loc
                if len(loc) < size_d:
                    tab[s, len(loc):] = loc[0] if loc else 0
            self.pair_sizes.append(size_d)
            self.pair_send_idx.append(tab)

        # Remap: global cell id -> index into [local block | halo buffer]
        # for each shard. Halo buffer layout = concat over deltas d of the
        # size_d cells received from shard s-d (in that sender's sorted
        # order) - matching halo_exchange below.
        off = {}
        o = 0
        for d, sz in zip(deltas, self.pair_sizes):
            off[d] = o
            o += sz
        self.halo_size = o
        self.remap = np.zeros((n_shards, ncell), np.int32)
        for s in range(n_shards):
            # Local cells.
            self.remap[s] = 0
            lo, hi = s * B, (s + 1) * B
            self.remap[s, lo:hi] = np.arange(B)
            # Halo cells: position of c in the received buffer.
            for c in need[s]:
                src = owner[c]
                d = (s - src) % n_shards
                j = pair[(src, s)].index(c)
                self.remap[s, c] = B + off[d] + j
            # Cells neither local nor in the halo are unreachable under the
            # CFL bound; map them to 0 (reads would be wrong, which the
            # validation test guards against by construction).
        # Per-chip exchanged fraction of the global state under the
        # neighbor-wise exchange (recv volume / ncell).
        self.comm_fraction = self.halo_size / ncell
        # The all_gather layout's fraction, for comparison/accounting.
        self.comm_fraction_allgather = max_send * n_shards / ncell

    def jnp_tables(self):
        return (jnp.asarray(self.send_idx), jnp.asarray(self.remap))

    def ppermute_tables(self):
        """Per-delta send tables + ppermute permutations for
        halo_exchange: ([(n_shards, size_d) int32 ...], [[(src, dst)...]
        ...])."""
        perms = [[(s, (s + d) % self.n_shards) for s in range(self.n_shards)]
                 for d in self.deltas]
        return ([jnp.asarray(t) for t in self.pair_send_idx], perms)

    def bytes_per_exchange(self, nfields: int, np2: int, itemsize: int = 8):
        """Per-chip RECEIVED bytes for one halo exchange of `nfields`
        (ncell, np2) fields (the comm-volume accounting of VERDICT #7)."""
        return self.halo_size * np2 * nfields * itemsize

    def coverage_ok(self, ci, d2c_map, np2):
        """Verify the halo depth covers this step's actual departure
        cells: every (target cell, node) read must resolve locally or in
        the halo (the analogue of the reference's CFL/halo assumption,
        slmmir_remapper.cpp:7). Host-side check for tests/setup."""
        ci = np.asarray(ci)
        d2c = np.asarray(d2c_map).reshape(-1, np2)
        B = self.block
        ncell = d2c.shape[0]
        tgt_shard = np.repeat(np.arange(ncell) // B, np2)
        src = ci[d2c.reshape(-1)]
        rm = self.remap[tgt_shard, src]
        local = (src // B) == tgt_shard
        ok_local = rm == (src - tgt_shard * B)
        ok_halo = rm >= B
        return bool(np.all(np.where(local, ok_local, ok_halo)))


def halo_exchange(st, axis_name: str, send_tabs, perms):
    """Neighbor-wise point-to-point halo exchange inside shard_map.

    st: (nfields, B, np2) this shard's local block. Returns
    (nfields, B + halo_size, np2): local block followed by the per-delta
    receive buffers (layout matching HaloMaps.remap). One `lax.ppermute`
    per occurring shard-offset delta - point-to-point messages between
    neighbor shards only (the reference's one-message-per-rank-pair
    pattern, cedr_tree.cpp:185-213), so per-chip volume is O(own
    perimeter), independent of n_shards. The exchanged values are copies
    (no arithmetic), so results stay bitwise identical to any other
    exchange layout.
    """
    s = jax.lax.axis_index(axis_name)
    parts = [st]
    for tab, perm in zip(send_tabs, perms):
        bnd = st[:, tab[s], :]                       # (nf, size_d, np2)
        parts.append(jax.lax.ppermute(bnd, axis_name, perm))
    return jnp.concatenate(parts, axis=1)


def halo_interp(mesh_dev: Mesh, maps: HaloMaps, field, ci, w, d2c_map):
    """Departure interpolation + scatter-to-DGLL with explicit halo
    exchange.

    field: (nt, ncell, np2) cell-sharded; ci: (cnn,) source cell per
    continuous node (replicated); w: (cnn, np2) weights (replicated);
    d2c_map: (ncell*np2,) dgll slot -> continuous node id. Returns the
    interpolated target field (nt, ncell, np2), cell-sharded: every shard
    computes exactly its own cells' nodes, whose departure cells lie
    within the halo by the CFL bound.

    Inside shard_map: each shard ships only its per-neighbor boundary
    cells over ICI (`ppermute` per shard-offset delta vs the full
    (ncell,) block GSPMD moves), then gathers locally through the static
    remap table.
    """
    send_tabs, perms = maps.ppermute_tables()
    _, remap = maps.jnp_tables()
    np2 = field.shape[-1]
    d2c_blk = d2c_map.reshape(-1, np2)               # (ncell, np2), sharded

    def body(field_blk, d2c_b, ci_, w_, remap_):
        # field_blk: (nt, B, np2) this shard's block; d2c_b: (B, np2).
        s = jax.lax.axis_index("cells")
        ext = halo_exchange(field_blk, "cells", send_tabs, perms)
        nodes = d2c_b.reshape(-1)                    # (B*np2,)
        src_cells = remap_[s][ci_[nodes]]            # (B*np2,)
        src = ext[:, src_cells, :]                   # (nt, B*np2, np2)
        vals = jnp.einsum('ndx,dx->nd', src, w_[nodes])
        return vals.reshape(field_blk.shape)

    fn = jax.shard_map(
        body, mesh=mesh_dev,
        in_specs=(P(None, "cells", None), P("cells", None), P(), P(), P()),
        out_specs=P(None, "cells", None),
        check_vma=False)
    return fn(field, d2c_blk, ci, w, remap)
