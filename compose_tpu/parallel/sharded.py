"""The designed multi-chip transport step: shard_map + halo exchange + BFB
tree reductions + sharded QLT.

This is the live O(perimeter) communication path VERDICT/SURVEY §2.5 call
for, replacing the legacy GSPMD path (parallel/sharding.py) that let XLA
all-gather the full tracer state per step. Per step, the only collectives
are:

  1. one neighbor-wise `ppermute` halo exchange of (rho, q) before the
     departure gather (parallel/halo.py tables; the reference's CFL halo,
     slmmir_remapper.cpp:7, and its one-message-per-rank-pair pattern,
     cedr_tree.cpp:185-213) - issued FIRST in the step so XLA's
     latency-hiding scheduler overlaps it with the departure-trajectory
     compute, which is independent of the field values,
  2. one boundary `ppermute` exchange of rho before the density DSS and
     one of (rho, q) before the tracer DSS (ring-1 continuity),
  3. O(n_shards * log ncell) scalars for the BFB tree sums (cdr/bfb.py,
     matching cedr_bfb_tree_allreduce.cpp:79-159) and the sharded QLT
     frontier (cdr/qlt_sharded.py, matching cedr_qlt.cpp:619-640),

so the exchanged volume is O(boundary) while every per-cell phase
(trajectories, Newton inverse map, interpolation, limiter, local DSS
arithmetic) runs on local blocks only.

BITWISE contract: every phase reproduces the single-chip step's arithmetic
per node/cell - elementwise geometry is recomputed per DGLL slot (identical
inputs => identical bits), the DSS uses the gather formulation's exact
per-node masked sums, global sums go through the decomposition-invariant
BFB tree, and the QLT sweeps run the same tree with a sharded level
schedule. tests/test_sharding.py asserts == 0 agreement with the
single-device step (gather-DSS formulation) at ndev in {2, 8}. The
single-chip FaceDss fast path merges the DSS in a different (also fixed)
order; against it the sharded step agrees to DSS roundoff (~1e-15) - that
reordering is the ONLY difference.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..cdr.bfb import BfbTreeAllReducer, get_reducer
from ..cdr.qlt_sharded import ShardedQLT
from ..cdr import qlt as qlt_mod
from ..mesh import cubed_sphere
from ..ops import sqr
from ..transport import limiter as limiter_mod, spf, timeint
from .halo import DssSlotExchange, HaloMaps, halo_exchange
from .sharding import cell_mesh


class ShardedIsl:
    """Cell-sharded ISL transport step over a 1-D 'cells' device mesh.

    Wraps a single-chip IslTransport model: all static mesh/basis data is
    reused; the step body is re-expressed as a shard_map program with
    explicit halo exchange. Supported configs: filter in
    {caas, qlt, mn2, caas-node, none}, any cell-local limiter, rho_isl
    on/off, positive_only, f32/f64 geometry+interp, timeint
    exact/line/interp/interpline, uniform meshes (nonuniform meshes
    would only change `locate`). Bitwise vs the single chip at np=4;
    np=8's 64-wide per-cell reductions lower batch-dependently and sit
    within a few ulp (tests pin both).
    caas-node runs its node-granularity CAAS through the distributed BFB
    reducer (bitwise-equal to the single chip's bfb_sum form); mn2
    all_gathers the O(ncell) per-cell records and solves its global
    n-dim QP replicated - the reference's own scale tradeoff (4 scalars
    per cell per tracer, VERDICT r3 #5 / cedr_caas.cpp:203-209).
    """

    @classmethod
    def with_measured_halo(cls, model, n_shards: int, step_times,
                           owner=None, margin_rings: int = 0,
                           base_rings: int = 1, **kw):
        """Build with a measured-footprint halo: integrate the departure
        field at the run's (ts, tf) windows in `step_times`, take the
        union of foreign source cells per shard (+ optional margin rings)
        together with the balanced ring-`base_rings` neighborhood
        (halo.measured_need_sets) - ~2/3 of the ring-2 volume at the
        flagship size. coverage_ok still guards every step."""
        from .halo import measured_need_sets

        m = model.mesh
        if owner is None:
            B = -(-m.ncell // n_shards)
            owner = np.arange(m.ncell) // B
        dep = jax.jit(model._departure_data)
        ci_list = [np.asarray(dep(t0, t1)[1]) for (t0, t1) in step_times]
        need = measured_need_sets(m, owner, ci_list, model.d2c_map, m.np2,
                                  margin_rings, n_shards, base_rings)
        return cls(model, n_shards, owner=owner, need_sets=need, **kw)

    def __init__(self, model, n_shards: int, depth: int = 2, mesh_dev=None,
                 owner=None, need_sets=None):
        cfg = model.config
        m = model.mesh
        assert cfg.filter in ("caas", "qlt", "none", "caas-node",
                              "mn2"), cfg.filter
        assert not m.nonuni and not m.is_subcell
        assert cfg.timeint in ("exact", "line", "interp",
                               "interpline"), cfg.timeint
        assert model.fitext is None, "-fitext: single-chip path only"
        self.model = model
        self.cfg = cfg
        self.m = m
        self.n_shards = n_shards
        # `owner`: optional cell->shard map (halo.tile_owner for the 2-D
        # face-tile layout whose halo volume scales with tile perimeter);
        # default contiguous linear blocks. State and per-cell tables are
        # laid out in BLOCK order (shard-major per-shard sorted cell
        # lists; identical to the global order for contiguous divisible
        # decompositions).
        self.maps = HaloMaps(m, n_shards, depth, owner=owner,
                             need_sets=need_sets)
        self.B = self.maps.block
        # Pad rows (ragged or tiled layouts) carry finite dummies (cell
        # 0's geometry, zero state/weights) so every elementwise phase
        # stays finite, contribute exactly 0.0 to the global BFB sums
        # (weights are zero), resolve no DSS neighbor (mask4 False), and
        # are dropped from the returned state.
        self.pad = self.maps.ncell_pad - m.ncell
        self.mesh_dev = mesh_dev if mesh_dev is not None \
            else cell_mesh(n_shards)
        # Block-layout translation: global cell c lives at flat block slot
        # inv_idx[c] = owner_shard * B + local_slot.
        mp = self.maps
        self._perm_flat = mp.perm.reshape(-1)
        self._padmask = (np.arange(self.B)[None]
                         >= mp.leaf_count[:, None]).reshape(-1)
        self._inv_idx = jnp.asarray(
            mp.owner * self.B + mp.leaf_slot)        # (ncell,)
        # BFB reducers over the REAL global trees with block-order leaves
        # (aligned-subtree fast path for contiguous blocks, run-structured
        # scattered leaves for tiles).
        if mp.contiguous:
            self.r_slots = get_reducer(m.ncell * m.np2, n_shards,
                                       block=self.B * m.np2)
            self.r_cells = get_reducer(m.ncell, n_shards, block=self.B)
        else:
            np2_ = m.np2
            slot_lists = [(l[:, None] * np2_
                           + np.arange(np2_)[None]).reshape(-1)
                          for l in mp.leaf_lists]
            self.r_slots = BfbTreeAllReducer(m.ncell * np2_, n_shards,
                                             block=self.B * np2_,
                                             leaf_lists=slot_lists)
            self.r_cells = BfbTreeAllReducer(m.ncell, n_shards,
                                             block=self.B,
                                             leaf_lists=mp.leaf_lists)
        if cfg.filter == "qlt":
            self.sqlt = ShardedQLT(m.ncell, n_shards,
                                   problem_type=qlt_mod.SHAPEPRESERVE,
                                   owner=None if mp.contiguous
                                   else mp.owner)
        else:
            self.sqlt = None

        np2 = m.np2
        # --- Static tables (host-built once).
        d2c = np.asarray(m.dgll2cgll)                    # (ncell, np2)
        self.node_xyz = jnp.asarray(
            self._pad_cells(np.asarray(m.cgll_xyz)[d2c],
                            mode="edge"))                # (ncell_p, np2, 3)
        c2d_idx = np.asarray(m.c2d_idx)                  # (cnn, 4)
        c2d_mask = np.asarray(m.c2d_mask)
        slots4 = c2d_idx[d2c.reshape(-1)]                # (ncell*np2, 4)
        # DSS weights in the MODEL's mass measure (dmc es -> dgbfi_sphere),
        # matching the single-chip FaceDss/_dss weights bitwise.
        Ff = np.asarray(model.F).reshape(-1)
        self.mask4 = jnp.asarray(self._pad_cells(
            c2d_mask[d2c.reshape(-1)].reshape(m.ncell, np2, 4)))
        self.F4 = jnp.asarray(self._pad_cells(
            Ff[slots4].reshape(m.ncell, np2, 4)))
        # Padded runtime divisor tables (F zero, jac one on pads).
        self.F_pad = jnp.asarray(self._pad_cells(np.asarray(model.F)))
        self.jac_pad = jnp.asarray(self._pad_cells(
            np.asarray(m.jac_node), fill=1.0))
        send_idx, remap = self.maps.jnp_tables()
        self.send_idx = send_idx
        self.remap = remap
        # Slot-level DSS exchange tables (halo.DssSlotExchange): the DSS
        # ships only the foreign coincident EDGE slots of boundary cells
        # (~np per boundary cell) instead of whole ring-2 cells.
        dssx = DssSlotExchange(self.maps, slots4, c2d_mask[d2c.reshape(-1)],
                               np2)
        self._dss_tabs = [jnp.asarray(t) for t in dssx.tabs]
        self._dss_perms = dssx.perms
        self.dss_halo_slots = dssx.halo_slots
        self.eslots4_dss = jnp.asarray(dssx.eslots4)
        # Neighbor-wise exchange tables (integer constants - safe to close
        # over; only float DIVISOR tables must be runtime operands).
        self.halo_tabs, self.halo_perms = self.maps.ppermute_tables()
        # -timeint interp: per-DGLL-slot coarse-grid interpolation tables
        # (the per-CGLL-node tables expanded to slots; each shard carries
        # its block). The coarse v-grid is SMALL and integrated redundantly
        # per shard - elementwise, so bitwise identical to the single chip.
        if model.vmesh is not None:
            d2c_flat = np.asarray(m.dgll2cgll).reshape(-1)
            vw = np.asarray(model.v_weights)[d2c_flat]
            voc = np.asarray(model.v_own_cell)[d2c_flat]
            self.v_w_slot = jnp.asarray(self._pad_cells(
                vw.reshape(m.ncell, m.np2, -1), mode="edge"))
            self.v_oc_slot = jnp.asarray(self._pad_cells(
                voc.reshape(m.ncell, m.np2).astype(np.int32), mode="edge"))
        else:
            self.v_w_slot = self.v_oc_slot = None
        self._step_jit = None
        self._coverage_checked = set()

    # ------------------------------------------------------------------
    def _pad_cells(self, a, fill=0.0, mode="constant"):
        """Lay a host (ncell, ...) table out in block order, padded to
        (ncell_pad, ...). For contiguous divisible decompositions this is
        the identity; ragged/tiled layouts gather per-shard cell lists.
        Pad rows: mode='edge' repeats a real row (finite dummy geometry);
        'constant' fills with `fill` (zero weights / unit Jacobians)."""
        if self.pad == 0 and self.maps.contiguous:
            return a
        out = np.array(a[self._perm_flat])
        if self._padmask.any():
            if mode == "edge":
                out[self._padmask] = a[0]
            else:
                out[self._padmask] = fill
        return out

    # ------------------------------------------------------------------
    def coverage_ok(self, ts, tf):
        """Host-side check that the halo depth covers this step's actual
        departure footprint (the CFL assumption, slmmir_remapper.cpp:7)."""
        _, ci, _ = jax.jit(self.model._departure_data)(ts, tf)
        return self.maps.coverage_ok(ci, self.model.d2c_map, self.m.np2)

    # ------------------------------------------------------------------
    def step(self, rho, q, ts, tf):
        """rho (ncell, np2), q (nt, ncell, np2), sharded or unsharded
        (jit will move them); returns cell-sharded (rho', q')."""
        # Enforce the CFL/halo assumption: HaloMaps.remap silently maps
        # out-of-halo cells to local index 0, so a departure footprint
        # beyond the halo depth would read wrong source cells. Checked
        # host-side once per step size (the gallery winds' CFL varies
        # slowly in time; the check integrates the full departure field).
        key = round(float(tf) - float(ts), 12)
        if key not in self._coverage_checked:
            if not self.coverage_ok(ts, tf):
                raise ValueError(
                    f"halo depth {self.maps.depth} does not cover the "
                    f"departure footprint of a dt={key} step; increase "
                    "`depth` or reduce dt")
            self._coverage_checked.add(key)
        if self._step_jit is None:
            mesh = self.mesh_dev
            body = jax.shard_map(
                self._body, mesh=mesh,
                in_specs=(P("cells", None), P(None, "cells", None),
                          P(), P(),
                          P("cells", None, None),   # node_xyz
                          P("cells", None),         # F
                          P("cells", None),         # jac_node
                          P("cells", None, None),   # eslots4_dss
                          P("cells", None, None),   # mask4
                          P("cells", None, None),   # F4
                          P()),                     # remap
                out_specs=(P("cells", None), P(None, "cells", None)),
                check_vma=False)

            pad = self.pad
            contig = self.maps.contiguous
            perm_j = jnp.asarray(self._perm_flat)
            padm = jnp.asarray(self._padmask)
            inv = self._inv_idx

            def stepfn(rho, q, ts, tf):
                if contig:
                    # Block order == global order (+ zero tail if ragged).
                    if pad:
                        rho = jnp.pad(rho, ((0, pad), (0, 0)))
                        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
                else:
                    # Tiled layout: permute state into block order (pads
                    # zeroed so their weighted contributions vanish).
                    rho = jnp.where(padm[:, None], 0.0, rho[perm_j])
                    q = jnp.where(padm[None, :, None], 0.0, q[:, perm_j])
                rho_o, q_o = body(rho, q, ts, tf, self.node_xyz, self.F_pad,
                                  self.jac_pad, self.eslots4_dss,
                                  self.mask4, self.F4, self.remap)
                if contig:
                    if pad:
                        rho_o = rho_o[:-pad]
                        q_o = q_o[:, :-pad]
                else:
                    rho_o = rho_o[inv]
                    q_o = q_o[:, inv]
                return rho_o, q_o

            self._step_jit = jax.jit(stepfn)
        return self._step_jit(rho, q, ts, tf)

    # ------------------------------------------------------------------
    # shard_map body and helpers. Everything below runs per shard with
    # axis_name "cells".

    def _halo_ext(self, st):
        """st: (C, B, np2) -> (C, B + halo_size, np2): local block followed
        by the per-delta neighbor receive buffers (halo.halo_exchange)."""
        return halo_exchange(st, "cells", self.halo_tabs, self.halo_perms)

    def _gsum_cells(self, x):
        return self.r_cells.allreduce(x, "cells")

    def _gsum_slots(self, x):
        return self.r_slots.allreduce(x, "cells")

    def _redistribute(self, rho_mass, Q_min, Q_mass, Q_max, extra):
        """Distributed MassRedistributor.redistribute: blocks in, blocks
        out, bitwise equal to the single-chip spf path."""
        if self.cfg.filter == "caas":
            return spf.glbl_caas_gsum(Q_min, Q_mass, Q_max, extra,
                                      self._gsum_cells)
        if self.cfg.filter == "mn2":
            # Replicated global n-dim QP over gathered per-cell records
            # (O(ncell) scalars << state); slice out the local block. With
            # a ragged decomposition the pads sit at the global tail of the
            # gathered layout - slice them off so run_mn2 sees exactly the
            # single-chip arrays (bitwise), then pad the solution back.
            s = jax.lax.axis_index("cells")
            ncell = self.m.ncell
            contig = self.maps.contiguous

            def gath(v):
                g = jax.lax.all_gather(v, "cells", axis=v.ndim - 1)
                g = g.reshape(v.shape[:-1] + (-1,))
                # Back to the exact single-chip global arrays (for tiled
                # layouts via the inverse block permutation; pads drop).
                return g[..., :ncell] if contig else g[..., self._inv_idx]

            out = spf.run_mn2(gath(Q_min), gath(Q_mass), gath(Q_max),
                              extra)
            # Solution back to block order, padded to n_shards * B.
            if contig:
                if self.pad:
                    out = jnp.pad(out, [(0, 0)] * (out.ndim - 1)
                                  + [(0, self.pad)])
            else:
                out = out[..., jnp.asarray(self._perm_flat)]
            return jax.lax.dynamic_slice_in_dim(
                out, s * self.B, self.B, axis=out.ndim - 1)
        squeeze = Q_mass.ndim == 1
        Qm = jnp.atleast_2d(Q_mass)
        out = self.sqlt.run(rho_mass, Qm, jnp.atleast_2d(Q_min),
                            jnp.atleast_2d(Q_max),
                            root_extra=jnp.broadcast_to(
                                jnp.asarray(extra), Qm.shape[:1]))
        return out[0] if squeeze else out

    def _departure_blk(self, node_xyz, ts, tf):
        """Mirror of IslTransport._departure_data on this shard's DGLL
        nodes (B*np2 of them). Elementwise per node, so bitwise equal to
        the single-chip per-CGLL-node computation."""
        model, cfg, m = self.model, self.cfg, self.m
        f32 = cfg.geom_dtype == "f32"
        if model.vmesh is not None:
            # -timeint interp: integrate the (small, replicated) coarse
            # velocity grid and interpolate departure points to this
            # shard's slots - the exact per-node arithmetic of the
            # single-chip path (duplicated per coincident slot; identical
            # inputs give identical bits).
            vm = model.vmesh
            vnodes = (vm.cgll_xyz.astype(jnp.float32) if f32
                      else vm.cgll_xyz)
            if cfg.timeint == "interpline":
                vdep = timeint.integrate_line(model.wind.velocity, tf, ts,
                                              vnodes)
            else:
                vdep = timeint.integrate(model.wind.velocity, tf, ts,
                                         vnodes, cfg.nsub)
            vdep_cells = vdep[vm.dgll2cgll]          # (ncell_v, vnp2, 3)
            s_ = jax.lax.axis_index("cells")
            B = node_xyz.shape[0]
            vw = jax.lax.dynamic_slice_in_dim(
                self.v_w_slot, s_ * B, B, 0).reshape(-1,
                                                     self.v_w_slot.shape[-1])
            voc = jax.lax.dynamic_slice_in_dim(
                self.v_oc_slot, s_ * B, B, 0).reshape(-1)
            dep = timeint.interp_departure(vw.astype(vdep.dtype),
                                           vdep_cells[voc])
            from ..ops import sphere as sphere_ops
            dep = sphere_ops.normalize(dep)
        else:
            nodes = node_xyz.reshape(-1, 3)
            if f32:
                nodes = nodes.astype(jnp.float32)
            if cfg.timeint == "line":
                dep = timeint.integrate_line(model.wind.velocity, tf, ts,
                                             nodes)
            else:
                dep = timeint.integrate(model.wind.velocity, tf, ts, nodes,
                                        cfg.nsub)
        ci, a0, b0 = cubed_sphere.locate(m, dep)
        corners = m.corners[ci]
        if f32:
            corners = corners.astype(jnp.float32)
            tol = 1e1 * float(jnp.finfo(jnp.float32).eps)
            a, b = sqr.sphere_to_ref(corners, dep, max_its=3, tol=tol,
                                     a0=a0, b0=b0)
        else:
            a, b = sqr.sphere_to_ref(corners, dep, max_its=4, a0=a0, b0=b0)
        va = model.basis.eval(a)
        vb = model.basis.eval(b)
        w = (vb[:, :, None] * va[:, None, :]).reshape(-1, m.np2)
        if f32:
            w = w.astype(jnp.float64)
        return dep, ci, w

    def _jacobian_blk(self, dep_blk):
        """IslTransport._jacobian_cells on this shard's cells; dep_blk
        (B, np2, 3) is already per-DGLL-slot."""
        m = self.m
        pc = dep_blk.reshape(dep_blk.shape[0], m.np_, m.np_, 3)
        return self.model._jacobian_cells(pc)

    def _slot_halo_ext(self, st):
        """Slot-level DSS exchange: st (C, B, np2) -> (C, B*np2 + H)
        where H = dss_halo_slots foreign coincident slots (edge slots of
        boundary cells only - ~np per boundary cell vs np2 for a whole
        cell). One ppermute per shard-offset delta, copies only."""
        s = jax.lax.axis_index("cells")
        f = st.reshape(st.shape[0], -1)
        parts = [f]
        for tab, perm in zip(self._dss_tabs, self._dss_perms):
            parts.append(jax.lax.ppermute(f[:, tab[s]], "cells", perm))
        return jnp.concatenate(parts, axis=1)

    def _dss_rho_blk(self, rho_blk, eslots4, mask4, F4):
        """Gather-formulation DSS of a (B, np2) density block: one
        slot-level boundary exchange + the exact per-node arithmetic of
        dss.dss_gather."""
        ext = self._slot_halo_ext(rho_blk[None])[0]       # (B*np2+H,)
        vals = ext[eslots4]                               # (B, np2, 4)
        w = jnp.where(mask4, F4, 0.0)
        num = jnp.sum(w * vals, axis=-1)
        den = jnp.sum(w, axis=-1)
        # den == 0 only on ragged pad rows (every real slot has a weighted
        # coincident set); keep pads finite-zero so 0-weight products
        # downstream stay 0, not NaN. Bitwise neutral on real rows.
        ok = den > 0
        cg = num / jnp.where(ok, den, 1.0)
        big = jnp.where(mask4, vals, -jnp.inf)
        small = jnp.where(mask4, vals, jnp.inf)
        cg = jnp.clip(cg, jnp.min(small, axis=-1), jnp.max(big, axis=-1))
        return jnp.where(ok, cg, 0.0)

    def _dss_q_blk(self, rho_blk, q_blk, eslots4, mask4, F4):
        """Gather-formulation mixing-ratio DSS (dss.dss_q_gather_t) with
        one slot-level (rho, q) boundary exchange; tracer-innermost
        layout."""
        nt = q_blk.shape[0]
        st = jnp.concatenate([rho_blk[None], q_blk], axis=0)
        ext = self._slot_halo_ext(st)                     # (nt+1, B*np2+H)
        rho_f = ext[0]
        qT = jnp.moveaxis(ext[1:], 0, -1)                 # (slots, nt)
        vals = qT[eslots4]                                # (B, np2, 4, nt)
        rho4 = rho_f[eslots4]
        w = jnp.where(mask4, F4 * rho4, 0.0)[..., None]
        num = jnp.sum(w * vals, axis=-2)
        den = jnp.sum(w, axis=-2)
        w0 = jnp.where(mask4, F4, 0.0)[..., None]
        num0 = jnp.sum(w0 * vals, axis=-2)
        den0 = jnp.sum(w0, axis=-2)
        # den0 == 0 only on ragged pad rows; see _dss_rho_blk.
        ok0 = den0 > 0
        ok = den > 0
        cg = jnp.where(ok, num / jnp.where(ok, den, 1.0),
                       num0 / jnp.where(ok0, den0, 1.0))
        big = jnp.where(mask4[..., None], vals, -jnp.inf)
        small = jnp.where(mask4[..., None], vals, jnp.inf)
        cg = jnp.clip(cg, jnp.min(small, axis=-2), jnp.max(big, axis=-2))
        cg = jnp.where(ok | ok0, cg, 0.0)
        return jnp.moveaxis(cg, -1, 0)                    # (nt, B, np2)

    # ------------------------------------------------------------------
    def _body(self, rho, q, ts, tf, node_xyz, F, jac_node, eslots4,
              mask4, F4, remap):
        cfg, m = self.cfg, self.m
        s = jax.lax.axis_index("cells")
        rmp = remap[s]
        B, np2 = rho.shape
        nt = q.shape[0]
        Ff = F.reshape(-1)

        # --- Halo exchange of the source state, issued FIRST: it depends
        # only on the inputs, and the departure-trajectory compute below
        # depends only on node coordinates, so XLA's latency-hiding
        # scheduler overlaps the ppermute rounds with the interior
        # integration (SURVEY §7 stage 7).
        st = jnp.concatenate([rho[None], q], axis=0)
        ext = self._halo_ext(st)                          # (nt+1, B+H, np2)
        rho_ext, q_ext = ext[0], ext[1:]

        # --- Departure data for this shard's DGLL nodes.
        dep, ci, w = self._departure_blk(node_xyz, ts, tf)
        loc = rmp[ci]                                     # ext cell index

        # --- Density transport (mirrors _step_impl incl. the f32 fast
        # path; cast-then-gather here equals the single chip's
        # cast-then-gather since the halo ships the original f64 values).
        # np > 4 contracts via the explicit chain (see
        # IslTransport._interp: einsum's wide reduction is
        # batch-shape-dependent, breaking the bitwise contract at np8).
        contract = (self.model._interp_chain if m.np_ > 4
                    else (lambda s_, w_: jnp.einsum('...cx,cx->...c',
                                                    s_, w_)))
        if cfg.rho_isl:
            if cfg.interp_dtype == "f32":
                f32 = jnp.float32
                rho_src = rho_ext.astype(f32)[loc]
                rho_dep = contract(rho_src, w.astype(f32))
                Jdep = self._jacobian_blk(dep.reshape(B, np2, 3))
                ratio32 = Jdep.astype(f32) / jac_node.astype(f32)
                rho_tgt = (ratio32 * rho_dep.reshape(B, np2)).astype(
                    jnp.float64)
            else:
                rho_src = rho_ext[loc]                    # (B*np2, np2)
                rho_dep = contract(rho_src, w)
                Jdep = self._jacobian_blk(dep.reshape(B, np2, 3))
                ratio = Jdep.astype(jac_node.dtype) / jac_node
                rho_tgt = ratio * rho_dep.reshape(B, np2)
        else:
            rho_tgt = rho

        # --- Tracer interpolation (mirrors _step_impl's gather+einsum).
        if cfg.interp_dtype == "f32":
            q_src = q_ext.astype(jnp.float32)[:, loc, :]
            qi = contract(q_src, w.astype(jnp.float32)).astype(jnp.float64)
        else:
            qi = contract(q_ext[:, loc, :], w)
        q_tgt = qi.reshape(nt, B, np2)

        if cfg.filter == "none":
            if cfg.rho_isl:
                rho_out = self._dss_rho_blk(rho_tgt, eslots4, mask4, F4)
            else:
                rho_out = rho_tgt
            q_out = self._dss_q_blk(rho_out, q_tgt, eslots4, mask4, F4)
            return rho_out, q_out

        # --- CDR for rho.
        if cfg.rho_isl and cfg.filter == "caas-node":
            # Uniform mass restoration (glbl_only_pve,
            # slmmir_remapper_isl.cpp:366-387), distributed gsum form.
            mass_src = self._gsum_slots(Ff * rho.reshape(-1))
            mass_tgt = self._gsum_slots(Ff * rho_tgt.reshape(-1))
            rho_tgt = rho_tgt + (mass_src - mass_tgt) \
                / self._gsum_slots(Ff)
            rho_tgt = self._dss_rho_blk(rho_tgt, eslots4, mask4, F4)
        elif cfg.rho_isl:
            mass_src = self._gsum_slots(Ff * rho.reshape(-1))
            mass_tgt = self._gsum_slots(Ff * rho_tgt.reshape(-1))
            rho_mass, R_min, R_mass, R_max = spf.record(
                F, rho_tgt, rho_tgt,
                jnp.zeros_like(rho_tgt), jnp.full_like(rho_tgt, 2.0))
            redist = self._redistribute(rho_mass, R_min, R_mass, R_max,
                                        mass_src - mass_tgt)
            delta = redist - R_mass
            rho_tgt = limiter_mod.limit_density(F, rho_tgt, delta)
            rho_tgt = self._dss_rho_blk(rho_tgt, eslots4, mask4, F4)

        # --- CDR for tracers.
        Q_tgt = q_tgt * rho_tgt[None]
        Q_mass_src = self._gsum_slots(
            Ff[None] * q.reshape(nt, -1) * rho.reshape(-1)[None])
        Q_mass_tgt = self._gsum_slots(Ff[None] * Q_tgt.reshape(nt, -1))

        if cfg.positive_only:
            rhom = F[None] * rho_tgt[None]
            Qc_min = jnp.zeros(Q_tgt.shape[:2], Q_tgt.dtype)
            Qc_max = 2.0 * jnp.sum(rhom, axis=-1)
            Qc_mass = jnp.sum(F[None] * Q_tgt, axis=-1)
            redist = self._redistribute(
                jnp.sum(F * rho_tgt, axis=-1), Qc_min, Qc_mass, Qc_max,
                Q_mass_src - Q_mass_tgt)
            delta = redist - Qc_mass
            Q_tgt = jax.vmap(
                lambda Qi, di: limiter_mod.limit_density(F, Qi, di))(
                    Q_tgt, delta)
            rho_inv = 1.0 / jnp.where(rho_tgt == 0, 1.0, rho_tgt)
            q_new = jnp.where(rho_tgt[None] == 0, 0.0,
                              Q_tgt * rho_inv[None])
            q_out = self._dss_q_blk(rho_tgt, q_new, eslots4, mask4, F4)
            return rho_tgt, q_out

        # Source-cell bounds over [local | halo] cells.
        q_min_ext = jnp.min(q_ext, axis=-1)               # (nt, B+H)
        q_max_ext = jnp.max(q_ext, axis=-1)
        node_src = loc.reshape(B, np2)
        qmm = jnp.stack([q_min_ext, q_max_ext])           # (2, nt, B+H)
        qmm_n = jnp.moveaxis(
            jnp.moveaxis(qmm, (0, 1), (-2, -1))[node_src], (-2, -1),
            (0, 1))                                       # (2, nt, B, np2)
        q_min_node, q_max_node = qmm_n[0], qmm_n[1]

        if cfg.filter == "caas-node":
            # Node-granularity global CAAS (glbl_only_lcldyn,
            # slmmir_remapper_isl.cpp:389-445): identical arithmetic to
            # the single chip's caas_gsum-with-bfb_sum form (incl. the
            # relaxed-bounds cell-local prefilter), with the distributed
            # BFB reducer as the gsum.
            from ..ops import local_qp
            if cfg.limiter != "none":
                rel = 1e-2 * (q_max_node - q_min_node)
                lim = jax.vmap(
                    lambda Qi, qmin, qmax: limiter_mod.limit_tracer(
                        F, rho_tgt, Qi, qmin, qmax,
                        jnp.zeros(Qi.shape[0], Qi.dtype),
                        limiter=cfg.limiter, expand_bounds_allowed=True))
                Q_tgt = lim(Q_tgt, q_min_node - rel, q_max_node + rel)
            lo = (q_min_node * rho_tgt[None]).reshape(nt, -1)
            hi = (q_max_node * rho_tgt[None]).reshape(nt, -1)
            aF = jnp.broadcast_to(Ff[None], lo.shape)
            Qf = local_qp.caas_gsum(aF, Q_mass_src, lo, hi,
                                    Q_tgt.reshape(nt, -1),
                                    gsum=self._gsum_slots)
            Q_tgt = Qf.reshape(Q_tgt.shape)
            rho_inv = 1.0 / jnp.where(rho_tgt == 0, 1.0, rho_tgt)
            q_new = jnp.where(rho_tgt[None] == 0, q_min_node,
                              Q_tgt * rho_inv[None])
            q_new = jnp.clip(q_new, q_min_node, q_max_node)
            q_out = self._dss_q_blk(rho_tgt, q_new, eslots4, mask4, F4)
            return rho_tgt, q_out

        rhom1 = F * rho_tgt                        # (ncell, np2)
        rhom = rhom1[None]
        Qc_min = jnp.sum(rhom * q_min_node, axis=-1)
        Qc_max = jnp.sum(rhom * q_max_node, axis=-1)
        Qc_mass = jnp.sum(F[None] * Q_tgt, axis=-1)

        redist = self._redistribute(
            jnp.sum(F * rho_tgt, axis=-1), Qc_min, Qc_mass, Qc_max,
            Q_mass_src - Q_mass_tgt)
        delta = redist - Qc_mass

        if cfg.limiter != "none":
            # Hand the limiter the records this CDR already computed
            # (bitwise-identical expressions; saves ~3 full passes over
            # the tracer state), and take its mixing-ratio solution
            # directly - it is already bounds-clipped, so the Q -> q round
            # trip (x*rho*(1/rho) + re-clip) is pure added rounding
            # (round-3 CDR+limiter perf ask).
            Qm_tot = Qc_mass + delta
            lim = jax.vmap(
                lambda Qi, qmin, qmax, di, qt, qn, qx:
                limiter_mod.limit_tracer(
                    F, rho_tgt, Qi, qmin, qmax, di, limiter=cfg.limiter,
                    precomp=(rhom1, qt, qn, qx), return_q=True))
            x_q = lim(Q_tgt, q_min_node, q_max_node, delta, Qm_tot,
                      Qc_min, Qc_max)
            q_new = jnp.where(rho_tgt[None] == 0, q_min_node, x_q)

        if cfg.limiter == "none":
            rho_inv = 1.0 / jnp.where(rho_tgt == 0, 1.0, rho_tgt)
            q_new = jnp.where(rho_tgt[None] == 0, q_min_node,
                              Q_tgt * rho_inv[None])
            q_new = jnp.clip(q_new, q_min_node, q_max_node)

        q_out = self._dss_q_blk(rho_tgt, q_new, eslots4, mask4, F4)
        return rho_tgt, q_out
