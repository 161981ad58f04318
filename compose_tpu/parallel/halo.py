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


def tile_owner(mesh, n_shards: int):
    """2-D face-tile cell->shard map by recursive coordinate bisection of
    the cell centers on the sphere: split the cell set along its widest
    spatial extent into count-proportional halves, recurse. Regions are
    compact (area ~ ncell/n_shards, boundary ~ sqrt of that), so halo and
    DSS exchange volume scales with tile PERIMETER - the locality contract
    the linear-strip default forfeits at large n_shards
    (/root/reference/methods/slmm/slmmir_remapper.cpp:7's area-vs-perimeter
    halo argument; VERDICT r4 #5). Works for any n_shards >= 1."""
    centers = np.asarray(mesh.corners).mean(axis=1)
    centers = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    out = np.zeros(mesh.ncell, np.int64)

    def bisect(idx, ns, s0):
        if ns == 1:
            out[idx] = s0
            return
        nl = ns // 2
        k = int(round(len(idx) * nl / ns))
        ext = centers[idx].max(0) - centers[idx].min(0)
        ax = int(np.argmax(ext))
        order = idx[np.argsort(centers[idx, ax], kind="stable")]
        bisect(np.sort(order[:k]), nl, s0)
        bisect(np.sort(order[k:]), ns - nl, s0 + nl)

    bisect(np.arange(mesh.ncell), n_shards, 0)
    return out


class HaloMaps:
    """Static send/recv/remap tables for one (mesh, n_shards, depth).

    Ragged ncell (not divisible by n_shards) is supported with contiguous
    blocks of B = ceil(ncell / n_shards) cells: the last shard is short and
    its block is padded to B (ncell_pad = n_shards * B). Pad cells are
    inert - they are in no ring/send/need set and the remap table never
    resolves to them - but callers must ship FINITE values in the pad rows
    of sharded state (parallel/sharded.py pads with zeros) since they flow
    through elementwise phases before being dropped."""

    def __init__(self, mesh, n_shards: int, depth: int = 2, owner=None,
                 need_sets=None):
        ncell = mesh.ncell
        if owner is None:
            B = -(-ncell // n_shards)
            assert (n_shards - 1) * B < ncell, (ncell, n_shards)
            owner = np.arange(ncell) // B
        else:
            # Explicit cell->shard map (e.g. the 2-D face-tile layout from
            # tile_owner(): halo volume scales with tile PERIMETER instead
            # of strip length - the reference's area-vs-perimeter locality
            # contract, slmmir_remapper.cpp:7). Blocks are the per-shard
            # sorted cell lists, padded to the max count; `perm`/`leaf_slot`
            # translate global <-> block layouts.
            owner = np.asarray(owner, np.int64)
            assert owner.shape == (ncell,)
            counts = np.bincount(owner, minlength=n_shards)
            assert counts.min() >= 1, "every shard needs >= 1 cell"
            B = int(counts.max())
        self.owner = owner
        self.n_shards = n_shards
        self.block = B
        self.ncell_pad = n_shards * B
        self.depth = depth
        # Per-shard sorted cell lists + global<->block translation tables.
        self.leaf_lists = [np.nonzero(owner == s)[0]
                           for s in range(n_shards)]
        self.leaf_count = np.array([len(l) for l in self.leaf_lists])
        perm = np.zeros((n_shards, B), np.int64)
        leaf_slot = np.zeros(ncell, np.int64)
        for s, leaves in enumerate(self.leaf_lists):
            perm[s, :len(leaves)] = leaves
            perm[s, len(leaves):] = leaves[0]       # inert pad rows
            leaf_slot[leaves] = np.arange(len(leaves))
        self.perm = perm                            # (n_shards, B) global ids
        self.leaf_slot = leaf_slot                  # global id -> local slot
        self.contiguous = bool(
            (owner == np.arange(ncell) // (-(-ncell // n_shards))).all()
            and B == -(-ncell // n_shards))
        if need_sets is not None:
            # Explicit per-shard remote-cell sets (measured_need_sets: the
            # union of the run's actual departure footprints + a safety
            # ring - the reference's own halo-sizing philosophy, max_hits
            # bounding the measured footprint, slmmir_remapper.cpp:7).
            # coverage_ok remains the per-step runtime guard.
            need = [set(int(c) for c in ns_ if owner[c] != s)
                    for s, ns_ in enumerate(need_sets)]
            send = [set() for _ in range(n_shards)]
            for s in range(n_shards):
                for c in need[s]:
                    send[owner[c]].add(c)
        else:
            rings = _cell_rings(mesh, depth)
            # Shard s needs remote cell c iff c is within `depth` rings of
            # one of s's cells: for cell c, the shards of ring(c).
            need = [set() for _ in range(n_shards)]  # remote cells per shard
            send = [set() for _ in range(n_shards)]  # local cells others need
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
            loc = [leaf_slot[c] for c in ids]
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
                loc = [leaf_slot[c] for c in cells]
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
            mine = self.leaf_lists[s]
            self.remap[s, mine] = np.arange(len(mine))
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
        tgt_shard = np.repeat(self.owner, np2)
        src = ci[d2c.reshape(-1)]
        rm = self.remap[tgt_shard, src]
        local = self.owner[src] == tgt_shard
        ok_local = rm == self.leaf_slot[src]
        ok_halo = rm >= B
        return bool(np.all(np.where(local, ok_local, ok_halo)))


def measured_need_sets(mesh, owner, ci_list, d2c_map, np2: int,
                       margin_rings: int = 0, n_shards: int = None,
                       base_rings: int = 1):
    """Per-shard remote-cell need sets from MEASURED departure footprints:
    the union over `ci_list` (one (cnn,) source-cell array per run step -
    enumerate the run's steps, the footprint is deterministic) of the
    foreign cells each shard's DGLL nodes read, expanded by `margin_rings`
    safety rings, UNIONED with the isotropic ring-`base_rings` neighborhood
    of the shard's own cells. The base keeps the per-delta ppermute buffer
    sizes balanced (padding is the max over shards per delta - a purely
    directional need set pads badly) and gives static robustness; the
    measured part adds only the genuinely-reached far cells. At the
    flagship ne30/8-tile size this is ~208 vs ring-2's 308 padded
    cells/shard. Pass to HaloMaps(need_sets=...); ShardedIsl's per-step
    coverage_ok remains the runtime guard against footprint drift."""
    owner = np.asarray(owner, np.int64)
    ns = int(owner.max()) + 1 if n_shards is None else n_shards
    d2c = np.asarray(d2c_map).reshape(-1)
    tgt_shard = np.repeat(owner, np2)
    need = [set() for _ in range(ns)]
    for ci in ci_list:
        src = np.asarray(ci)[d2c]
        foreign = owner[src] != tgt_shard
        for s in range(ns):
            need[s].update(
                np.unique(src[foreign & (tgt_shard == s)]).tolist())
    if margin_rings:
        rings = _cell_rings(mesh, margin_rings)
        for s in range(ns):
            ext = set()
            for c in need[s]:
                ext.update(rings[c])
            need[s] = {c for c in ext if owner[c] != s}
    if base_rings:
        rings = _cell_rings(mesh, base_rings)
        for c in range(owner.shape[0]):
            for c1 in rings[c]:
                if owner[c1] != owner[c]:
                    need[owner[c]].add(int(c1))
    return need


class DssSlotExchange:
    """Slot-level exchange tables for the DSS: ship only the foreign
    coincident DGLL slots each shard's continuous nodes read (the facing
    EDGE slots of ring-1 boundary cells, ~np per boundary cell) instead of
    whole ring-2 halo cells (np2 each) - ~5x less DSS traffic, identical
    bits (copies only). Layout-agnostic: works for strip, ragged, and tile
    owner maps.

    tabs[d]: (n_shards, size_d) LOCAL flat slot ids each shard sends to
    shard (s + delta_d); perms[d]: the matching ppermute permutation;
    eslots4: (ncell_pad, np2, 4) block-order coincident-slot table indexing
    [local B*np2 slots | received slot halo]."""

    def __init__(self, maps: "HaloMaps", slots4, mask_flat, np2):
        n_shards = maps.n_shards
        ncell = maps.owner.shape[0]
        owner_cell = maps.owner
        loc_slot = maps.leaf_slot * np2                  # cell -> base
        dst_all = np.repeat(owner_cell, np2)[:, None]
        src_all = owner_cell[slots4 // np2]              # (ncell*np2, 4)
        foreign = mask_flat & (src_all != dst_all)
        pair_slots = {}
        for dst in range(n_shards):
            rows = np.nonzero(np.repeat(owner_cell, np2) == dst)[0]
            gsl = slots4[rows][foreign[rows]]
            srcs = src_all[rows][foreign[rows]]
            for src in np.unique(srcs):
                pair_slots[(int(src), dst)] = np.unique(gsl[srcs == src])
        sdeltas = sorted({(d_ - s_) % n_shards for (s_, d_) in pair_slots})
        self.tabs, self.perms = [], []
        off = {}
        o = 0
        for dd in sdeltas:
            size_d = max((len(pair_slots.get((s_, (s_ + dd) % n_shards),
                                             ())) for s_ in range(n_shards)),
                         default=0)
            tab = np.zeros((n_shards, size_d), np.int32)
            for s_ in range(n_shards):
                g = pair_slots.get((s_, (s_ + dd) % n_shards), None)
                if g is not None and len(g):
                    loc = loc_slot[g // np2] + g % np2
                    tab[s_, :len(loc)] = loc
                    if len(loc) < size_d:
                        tab[s_, len(loc):] = loc[0]
            self.tabs.append(tab)
            self.perms.append([(s_, (s_ + dd) % n_shards)
                               for s_ in range(n_shards)])
            off[dd] = o
            o += size_d
        self.halo_slots = o
        B = maps.block
        # Per-shard slot remap: global slot -> [local B*np2 | slot halo].
        eslots = np.zeros((n_shards, ncell * np2), np.int64)
        base = loc_slot[np.arange(ncell * np2) // np2] \
            + np.arange(ncell * np2) % np2
        for s_ in range(n_shards):
            eslots[s_] = base
        for (src, dst), g in pair_slots.items():
            dd = (dst - src) % n_shards
            eslots[dst, g] = B * np2 + off[dd] + np.arange(len(g))
        # Block-order coincident-slot table (ncell_pad, np2, 4).
        s4r = slots4.reshape(ncell, np2, 4)
        e4 = np.zeros((n_shards, B, np2, 4), np.int32)
        for s_ in range(n_shards):
            e4[s_] = eslots[s_][s4r[maps.perm[s_]]]
        self.eslots4 = e4.reshape(maps.ncell_pad, np2, 4)

    def bytes_per_exchange(self, nfields: int, itemsize: int = 8):
        """Per-chip RECEIVED bytes for one slot-level DSS exchange."""
        return self.halo_slots * nfields * itemsize


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
    ncell = field.shape[-2]
    pad = maps.ncell_pad - ncell
    d2c_blk = d2c_map.reshape(-1, np2)               # (ncell, np2), sharded
    if pad:
        # Ragged decomposition: pad the last shard's block with inert
        # cells (zero values, node-0 slots); sliced off on return.
        field = jnp.pad(field, ((0, 0), (0, pad), (0, 0)))
        d2c_blk = jnp.pad(d2c_blk, ((0, pad), (0, 0)))

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
    out = fn(field, d2c_blk, ci, w, remap)
    return out[:, :ncell] if pad else out
