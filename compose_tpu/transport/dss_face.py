"""Face-grid DSS via flat lane-rolls: O(1) structured shifts, no gathers.

The reference's D2Cer (methods/slmm/slmmir_d2c.{hpp,cpp}) loops a CSR map
over continuous nodes. The gather formulation in transport/dss.py avoids
scatters but still issues one gather row per (continuous node x <=4
coincident slots), and TPU gathers serialize per row.

This module exploits the cubed-sphere structure instead: cells are numbered
(face, cy, cx) row-major and nodes (j, i) within a cell, so in the FLAT
DGLL numbering s = (((f*ne + cy)*ne + cx)*np + j)*np + i almost every
coincidence is a fixed-offset neighbor:

  - x-pairs: slot (j, i=np-1) of (cy, cx) and (j, i=0) of (cy, cx+1)
    differ by dx = np^2 - (np-1);
  - y-pairs: slot (np-1, i) of (cy, cx) and (0, i) of (cy+1, cx)
    differ by dy = ne*np^2 - (np-1)*np.

So each merge pass is `a + mask * roll(a, +-d)` on the fully tile-packed
(rows, ndgll) layout - contiguous lane shifts, zero padding waste, no
transposes. Corner nodes compose through the x-then-y pass order exactly as
a tensor product, giving the full 4-way coincident sums/mins/maxes. The
only nodes the passes miss are on CUBE edges (two or three faces meet,
~12*ne*(np-1) of them); those are fixed afterwards with the exact gather
formula over their <=4 coincident slots.

Two execution paths with the same merge-pass structure:
  - XLA (any dtype/backend): jnp.roll merges, used for f64 and on CPU;
  - Pallas TPU kernel (f32): all merges fuse into one VMEM-resident kernel
    (one HBM read + one write per tracer block) - measured 8.8x over the
    round-1 slice-update formulation at ne30/np4/nt40 on v5e. The paths
    agree to f32 roundoff, not bitwise: dss() divides by the precomputed
    f64-merged den0 on the XLA path but by the in-kernel f32-merged den on
    the Pallas path. The Pallas path is gated on single-device f32 TPU
    inputs and on a VMEM lane budget (see _use_pallas); everything else
    falls back to XLA.

The construction is validated structurally at build time (union-find over
the pass-merged pairs vs. the mesh's d2c map), so any mesh whose numbering
deviates (e.g. subcell meshes) is rejected and the caller falls back to the
gather path. Results are deterministic (fixed pass order) and agree with
dss.py to roundoff (summation order within a coincident set differs).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import df64

try:                          # pallas-TPU registration fails on cpu-only
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:             # pragma: no cover - exercised under cpu tests
    pl = pltpu = None


def _decode_slots(ne, np_):
    """Flat DGLL slot -> (face, cy, cx, j, i)."""
    ncell = 6 * ne * ne
    np2 = np_ * np_
    s = np.arange(ncell * np2)
    c, k = s // np2, s % np2
    f, r = c // (ne * ne), c % (ne * ne)
    cy, cx = r // ne, r % ne
    j, i = k // np_, k % np_
    return f, cy, cx, j, i


@functools.lru_cache(maxsize=None)
def _q_kernel(dx, dy, n, nrow):
    """Pallas TPU kernel for the f32 dss_q merge block (fix pass excluded).

    Block layout: q rows (nrow, n) per program; weight/mask rows (1, n)
    broadcast. All merges are lane-rolls in VMEM.
    """
    dx, dy, n = np.int32(dx), np.int32(dy), np.int32(n)

    def kernel(w_ref, F_ref, den0_ref, mxl_ref, mxr_ref, myd_ref, myu_ref,
               q_ref, out_ref):
        mxl, mxr = mxl_ref[...], mxr_ref[...]
        myd, myu = myd_ref[...], myu_ref[...]

        def madd(a):
            xm = (a + mxl * pltpu.roll(a, n - dx, 1)
                  + mxr * pltpu.roll(a, dx, 1))
            return (xm + myd * pltpu.roll(xm, n - dy, 1)
                    + myu * pltpu.roll(xm, dy, 1))

        def mop(a, op):
            xm = jnp.where(mxl > 0, op(a, pltpu.roll(a, n - dx, 1)), a)
            xm = jnp.where(mxr > 0, op(xm, pltpu.roll(a, dx, 1)), xm)
            ym = jnp.where(myd > 0, op(xm, pltpu.roll(xm, n - dy, 1)), xm)
            return jnp.where(myu > 0, op(ym, pltpu.roll(xm, dy, 1)), ym)

        q = q_ref[...]
        wf = w_ref[...]
        Ff = F_ref[...]
        num = madd(wf * q)
        num0 = madd(Ff * q)
        den = madd(wf)
        mn = mop(q, jnp.minimum)
        mx = mop(q, jnp.maximum)
        ok = den > 0
        cg = jnp.where(ok, num / jnp.where(ok, den, 1.0),
                       num0 / den0_ref[...])
        out_ref[...] = jnp.clip(cg, mn, mx)

    return kernel


@functools.lru_cache(maxsize=None)
def _q_kernel_dd(dx, dy, n, nrow):
    """Pallas TPU kernel for the f64 dss_q merge block via explicit
    double-float (two-f32) arithmetic (ops/df64.py).

    XLA's own f64 emulation of the roll-merge chain compiles to dozens of
    unfused HBM-bound kernels (~4 ms in-step at ne30/nt40); this kernel runs
    the identical merge structure VMEM-resident on (hi, lo) f32 pairs in one
    dispatch. Bounds stay exact: the final clip selects among pair values
    (min/max/select are lexicographic, returning inputs verbatim), so
    q_out in [min, max] of the coincident slots holds bitwise. The weighted
    average itself carries df64 (~1e-14 relative) rounding instead of f64
    (~1e-16) - DSS mass redistribution noise, well inside the 1e-12 mass
    and 5e-13 bounds invariants (validated on TPU, see tests/test_df64.py
    for the arithmetic and tools/exp_r5_dd_check.py for the in-situ check).
    """
    dx, dy, n = int(dx), int(dy), int(n)

    def kernel(wh_ref, wl_ref, Fh_ref, Fl_ref, mxl_ref, mxr_ref, myd_ref,
               myu_ref, qh_ref, ql_ref, oh_ref, ol_ref):
        bxl = mxl_ref[...] > 0
        bxr = mxr_ref[...] > 0
        byd = myd_ref[...] > 0
        byu = myu_ref[...] > 0

        def roll_pair(a, s):
            return (pltpu.roll(a[0], s, 1), pltpu.roll(a[1], s, 1))

        def masked(m, a):
            z = jnp.zeros_like(a[0])
            return (jnp.where(m, a[0], z), jnp.where(m, a[1], z))

        def madd(a):
            xm = df64.add(df64.add(a, masked(bxl, roll_pair(a, n - dx))),
                          masked(bxr, roll_pair(a, dx)))
            return df64.add(
                df64.add(xm, masked(byd, roll_pair(xm, n - dy))),
                masked(byu, roll_pair(xm, dy)))

        def mop(a, op):
            xm = df64.select(bxl, op(a, roll_pair(a, n - dx)), a)
            xm = df64.select(bxr, op(xm, roll_pair(a, dx)), xm)
            ym = df64.select(byd, op(xm, roll_pair(xm, n - dy)), xm)
            return df64.select(byu, op(ym, roll_pair(xm, dy)), ym)

        w = (wh_ref[...], wl_ref[...])
        F = (Fh_ref[...], Fl_ref[...])
        # Two-stage weights (see the XLA path in dss_q): zero-mass nodes
        # fall back to the static dgbfi weights. Merged weights are sums of
        # nonnegative terms, so den > 0 iff den_hi > 0.
        den = madd(w)
        w2 = df64.select(den[0] > 0, w, F)
        den2 = madd(w2)
        q = (qh_ref[...], ql_ref[...])
        num = madd(df64.mul(w2, q))
        mn = mop(q, df64.min_)
        mx = mop(q, df64.max_)
        cg = df64.clip(df64.div(num, den2), mn, mx)
        oh_ref[...] = cg[0]
        ol_ref[...] = cg[1]

    return kernel


class FaceDss:
    """Precomputed face-grid DSS for a standard cubed-sphere mesh.

    build() returns None when the mesh numbering is not the standard
    (face, cy, cx, j, i) row-major layout (validated, not assumed).
    """

    _PALLAS_ROWS = 8          # f32 sublane multiple per kernel program

    def __init__(self, ne, np_, d2c_map_np, c2d_idx_np, c2d_mask_np, F):
        self.ne, self.np_ = ne, np_
        self.pallas_enabled = True
        ncell, np2 = 6 * ne * ne, np_ * np_
        ndgll = ncell * np2
        f, cy, cx, j, i = _decode_slots(ne, np_)
        on_perim = (((cx == 0) & (i == 0)) | ((cx == ne - 1) & (i == np_ - 1))
                    | ((cy == 0) & (j == 0))
                    | ((cy == ne - 1) & (j == np_ - 1)))
        # Continuous nodes needing the exact-gather fix: any slot on a face
        # perimeter (cube-edge nodes; also catches ne==1 degenerate cases).
        slot_node = d2c_map_np
        fix_nodes = np.unique(slot_node[on_perim])
        self.fix_idx = jnp.asarray(c2d_idx_np[fix_nodes])       # (nfix, 4)
        self.fix_mask = jnp.asarray(c2d_mask_np[fix_nodes])     # (nfix, 4)
        # Scatter targets: every valid slot of each fix node; masked lanes
        # scatter out of bounds and are dropped.
        tgt = np.where(c2d_mask_np[fix_nodes], c2d_idx_np[fix_nodes], ndgll)
        self.fix_tgt = jnp.asarray(tgt)                         # (nfix, 4)
        self.ndgll = ndgll
        self.shape5 = (6, ne, ne, np_, np_)
        self.F = F                                              # (ncell, np2)
        # Roll-merge structure: offsets and edge masks (row vectors).
        self.dx = np2 - (np_ - 1)
        self.dy = ne * np2 - (np_ - 1) * np_
        mxl = ((i == np_ - 1) & (cx < ne - 1))[None]
        mxr = ((i == 0) & (cx > 0))[None]
        myd = ((j == np_ - 1) & (cy < ne - 1))[None]
        myu = ((j == 0) & (cy > 0))[None]
        self._bmasks = tuple(jnp.asarray(m) for m in (mxl, mxr, myd, myu))
        self._fmasks32 = tuple(
            jnp.asarray(m.astype(np.float32)) for m in (mxl, mxr, myd, myu))
        # den0 (sum of static weights over coincident slots) is static.
        Fm = self._merge_np(np.asarray(F).reshape(-1))
        self.den0 = jnp.asarray(Fm)

    # -- structural validation + factory ---------------------------------
    @staticmethod
    def build(mesh, F=None):
        """Return a FaceDss for `mesh`, or None if the numbering does not
        match the standard face-grid layout.

        F: the dgbfi weights defining the DSS average - MUST be the same
        measure the caller's CDR conserves (d2c with weights w conserves
        sum(w * field) and nothing else, slmmir_d2c.cpp:60-84). Defaults to
        the Homme/GLL weights (-dmc f/eh); pass mesh.dgbfi_sphere for a
        sphere-measure (-dmc es) pipeline."""
        ne, np_ = mesh.ne, mesh.np_
        if 6 * ne * ne != mesh.ncell:
            return None
        d2c = np.asarray(mesh.dgll2cgll).reshape(-1)
        c2d_idx = np.asarray(mesh.c2d_idx)
        c2d_mask = np.asarray(mesh.c2d_mask)
        if not FaceDss._validate(ne, np_, d2c, c2d_idx, c2d_mask):
            return None
        return FaceDss(ne, np_, d2c, c2d_idx, c2d_mask,
                       mesh.dgbfi_gll if F is None else F)

    @staticmethod
    def _validate(ne, np_, d2c_map, c2d_idx, c2d_mask):
        """Union-find over the pairs the passes merge (+ fix-node groups)
        must reproduce the mesh's coincidence classes exactly."""
        ncell, np2 = 6 * ne * ne, np_ * np_
        ndgll = ncell * np2
        f, cy, cx, j, i = _decode_slots(ne, np_)

        def flat(f_, cy_, cx_, j_, i_):
            return (((f_ * ne + cy_) * ne + cx_) * np_ + j_) * np_ + i_

        parent = np.arange(ndgll)

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb

        F, CY, CX, J = np.meshgrid(np.arange(6), np.arange(ne),
                                   np.arange(ne - 1), np.arange(np_),
                                   indexing="ij")
        L = flat(F, CY, CX, J, np_ - 1).ravel()
        R = flat(F, CY, CX + 1, J, 0).ravel()
        for a, b in zip(L, R):
            union(a, b)
        F, CY, CX, I = np.meshgrid(np.arange(6), np.arange(ne - 1),
                                   np.arange(ne), np.arange(np_),
                                   indexing="ij")
        D = flat(F, CY, CX, np_ - 1, I).ravel()
        U = flat(F, CY + 1, CX, 0, I).ravel()
        for a, b in zip(D, U):
            union(a, b)
        on_perim = (((cx == 0) & (i == 0)) | ((cx == ne - 1) & (i == np_ - 1))
                    | ((cy == 0) & (j == 0))
                    | ((cy == ne - 1) & (j == np_ - 1)))
        fix_nodes = np.unique(d2c_map[on_perim])
        for node in fix_nodes:
            slots = c2d_idx[node][c2d_mask[node]]
            for b in slots[1:]:
                union(slots[0], b)
        roots = np.array([find(a) for a in range(ndgll)])
        # Pass-derived classes must equal the mesh's coincidence classes.
        _, class_a = np.unique(roots, return_inverse=True)
        _, class_b = np.unique(d2c_map, return_inverse=True)
        # Same partition <=> the pairing (class_a, class_b) is a bijection.
        pairs = class_a.astype(np.int64) * (class_b.max() + 1) + class_b
        return bool(np.unique(pairs).size == np.unique(class_a).size
                    == np.unique(class_b).size)

    # -- merge passes (XLA; any dtype/backend) ----------------------------
    def _merge_add(self, a):
        """Sum-merge the intra-face coincident slots of (rows, ndgll) `a`
        (cube-edge nodes are finished by the fix pass). Masked neighbors
        enter via `where` selects, not mask multiplies - a f64 multiply is
        emulated on TPU while a select is cheap, and 1.0*x / 0.0*x give the
        identical result for finite x."""
        bxl, bxr, byd, byu = self._bmasks
        dx, dy = self.dx, self.dy
        z = jnp.zeros((), a.dtype)
        xm = (a + jnp.where(bxl, jnp.roll(a, -dx, -1), z)
              + jnp.where(bxr, jnp.roll(a, dx, -1), z))
        return (xm + jnp.where(byd, jnp.roll(xm, -dy, -1), z)
                + jnp.where(byu, jnp.roll(xm, dy, -1), z))

    def _merge_op(self, a, op):
        """min/max-merge of (rows, ndgll) `a`."""
        bxl, bxr, byd, byu = self._bmasks
        dx, dy = self.dx, self.dy
        xm = jnp.where(bxl, op(a, jnp.roll(a, -dx, -1)), a)
        xm = jnp.where(bxr, op(xm, jnp.roll(a, dx, -1)), xm)
        ym = jnp.where(byd, op(xm, jnp.roll(xm, -dy, -1)), xm)
        return jnp.where(byu, op(ym, jnp.roll(xm, dy, -1)), ym)

    def _merge_np(self, flat):
        """Numpy sum-merge of a static (ndgll,) array (for den0)."""
        a = flat.reshape(self.shape5).copy()
        c = a[:, :, :-1, :, -1] + a[:, :, 1:, :, 0]
        a[:, :, :-1, :, -1] = c
        a[:, :, 1:, :, 0] = c
        c = a[:, :-1, :, -1, :] + a[:, 1:, :, 0, :]
        a[:, :-1, :, -1, :] = c
        a[:, 1:, :, 0, :] = c
        return a.reshape(flat.shape)

    # -- cube-edge fix pass (exact <=4-slot formula; XLA) ------------------
    def _fix_q(self, cg, qf, wff, Ff):
        """Overwrite the cube-edge nodes of cg (nt, ndgll) with the exact
        weighted average over their coincident slots of qf; weights wff
        with Ff fallback at zero mass."""
        nt = qf.shape[0]
        qT = jnp.moveaxis(qf, 0, -1)                  # (ndgll, nt)
        vals = qT[self.fix_idx]                       # (nfix, 4, nt)
        wfix = jnp.where(self.fix_mask, wff[self.fix_idx], 0.0)[..., None]
        w0fix = jnp.where(self.fix_mask, Ff[self.fix_idx], 0.0)[..., None]
        numf = jnp.sum(wfix * vals, axis=1)
        denf = jnp.sum(wfix, axis=1)
        num0f = jnp.sum(w0fix * vals, axis=1)
        den0f = jnp.sum(w0fix, axis=1)
        okf = denf > 0
        cgf = jnp.where(okf, numf / jnp.where(okf, denf, 1.0), num0f / den0f)
        mkf = self.fix_mask[..., None]
        cgf = jnp.clip(cgf,
                       jnp.min(jnp.where(mkf, vals, jnp.inf), axis=1),
                       jnp.max(jnp.where(mkf, vals, -jnp.inf), axis=1))
        outT = jnp.moveaxis(cg, 0, -1)
        upd = jnp.broadcast_to(cgf[:, None], (cgf.shape[0], 4, nt))
        outT = outT.at[self.fix_tgt.reshape(-1)].set(
            upd.reshape(-1, nt).astype(cg.dtype), mode="drop")
        return jnp.moveaxis(outT, 0, -1)

    # -- pallas fast path --------------------------------------------------
    def _pallas_q(self, wf, qf):
        """f32 TPU merge block: (1, n) weights, (nt, n) tracers."""
        nt, n = qf.shape
        B = self._PALLAS_ROWS
        ntp = -(-nt // B) * B
        if ntp != nt:
            qf = jnp.pad(qf, ((0, ntp - nt), (0, 0)))
        kern = _q_kernel(self.dx, self.dy, n, B)
        f32 = jnp.float32
        mxl, mxr, myd, myu = self._fmasks32
        row = pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        blk = pl.BlockSpec((B, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        with jax.enable_x64(False):
            cg = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((ntp, n), f32),
                grid=(ntp // B,),
                in_specs=[row] * 7 + [blk],
                out_specs=blk,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(wf.astype(f32), self.F.reshape(1, -1).astype(f32),
              self.den0.reshape(1, -1).astype(f32), mxl, mxr, myd, myu, qf)
        return cg[:nt] if ntp != nt else cg

    def _pallas_q_dd(self, wf64, qf64):
        """f64 TPU merge block via the df64 kernel: wf64 (1, n) weights,
        qf64 (nt, n) tracers, both f64. Returns the clipped weighted
        average, f64."""
        oh, ol = self._pallas_q_dd_pairs(df64.split_f64(wf64),
                                         df64.split_f64(qf64))
        return df64.join_f64((oh, ol))

    def _pallas_q_dd_pairs(self, w_pair, q_pair):
        """Pair-level entry to the df64 merge kernel: w_pair ((1, n) hi/lo),
        q_pair ((nt, n) hi/lo). Returns the (hi, lo) merged block (pre
        edge-fix) - used directly by the fused CDR path to keep pairs
        flowing between kernels without f64 round trips."""
        qh, ql = q_pair
        wh, wl = w_pair
        nt, n = qh.shape
        B = self._PALLAS_ROWS
        ntp = -(-nt // B) * B
        Fh, Fl = df64.split_f64(self.F.reshape(1, -1).astype(jnp.float64))
        if ntp != nt:
            qh = jnp.pad(qh, ((0, ntp - nt), (0, 0)))
            ql = jnp.pad(ql, ((0, ntp - nt), (0, 0)))
        kern = _q_kernel_dd(self.dx, self.dy, n, B)
        f32 = jnp.float32
        mxl, mxr, myd, myu = self._fmasks32
        row = pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        blk = pl.BlockSpec((B, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        with jax.enable_x64(False):
            oh, ol = pl.pallas_call(
                kern,
                out_shape=(jax.ShapeDtypeStruct((ntp, n), f32),
                           jax.ShapeDtypeStruct((ntp, n), f32)),
                grid=(ntp // B,),
                in_specs=[row] * 8 + [blk, blk],
                out_specs=(blk, blk),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(wh, wl, Fh, Fl, mxl, mxr, myd, myu, qh, ql)
        return oh[:nt], ol[:nt]

    def _use_pallas_dd(self, dtype):
        return (pl is not None and dtype == jnp.float64
                and self.pallas_enabled
                and 2 * self.ndgll <= self._PALLAS_MAX_LANES
                and jax.default_backend() == "tpu")

    # The kernel keeps full (8, ndgll) + seven (1, ndgll) f32 rows plus
    # ~15 live roll temporaries in VMEM; stay well under the 100MB
    # vmem_limit_bytes and fall back to the XLA roll path beyond that
    # (~ne55 at np4). 1.5e6 lanes * 4B * ~15 ~= 90MB.
    _PALLAS_MAX_LANES = 1_500_000

    def _use_pallas(self, dtype):
        # pallas_enabled is cleared by sharded callers: pallas_call has no
        # GSPMD partitioning rule, so cell-sharded operands must take the
        # XLA roll path (or a shard_map-wrapped kernel).
        return (pl is not None and dtype == jnp.float32
                and self.pallas_enabled
                and self.ndgll <= self._PALLAS_MAX_LANES
                and jax.default_backend() == "tpu")

    # -- public ops --------------------------------------------------------
    def dss(self, field, clip_minmax=True):
        """DSS a (..., ncell, np2) field with the static dgbfi weights
        (dss.dss_gather equivalent; returns the same shape)."""
        lead = field.shape[:-2]
        vf = field.reshape((-1, self.ndgll)) if lead else \
            field.reshape(1, self.ndgll)
        nt = vf.shape[0]
        Ff = self.F.reshape(-1).astype(vf.dtype)
        if clip_minmax and self._use_pallas_dd(vf.dtype):
            # f64 single-field DSS == dss_q with rho = 1 (weights F, F > 0
            # everywhere so the fallback never fires); same df64 kernel.
            cg = self._pallas_q_dd(Ff[None], vf)
        elif clip_minmax and nt > 1 and self._use_pallas(vf.dtype):
            cg = self._pallas_q(Ff[None], vf)
        else:
            num = self._merge_add(Ff[None] * vf)
            cg = num / self.den0[None].astype(vf.dtype)
            if clip_minmax:
                mn = self._merge_op(vf, jnp.minimum)
                mx = self._merge_op(vf, jnp.maximum)
                cg = jnp.clip(cg, mn, mx)
        if clip_minmax:
            out = self._fix_q(cg, vf, Ff, Ff)
        else:
            # Unclipped variant: exact weighted average on fix nodes too.
            qT = jnp.moveaxis(vf, 0, -1)
            vals = qT[self.fix_idx]
            w0 = jnp.where(self.fix_mask, Ff[self.fix_idx], 0.0)[..., None]
            cgf = jnp.sum(w0 * vals, axis=1) / jnp.sum(w0, axis=1)
            outT = jnp.moveaxis(cg, 0, -1)
            upd = jnp.broadcast_to(cgf[:, None], vals.shape)
            outT = outT.at[self.fix_tgt.reshape(-1)].set(
                upd.reshape(-1, nt).astype(cg.dtype), mode="drop")
            out = jnp.moveaxis(outT, 0, -1)
        return out.reshape(field.shape)

    def dss_q(self, rho, q):
        """Mixing-ratio DSS (dss.dss_q_gather_t equivalent).

        rho: (ncell, np2); q: (nt, ncell, np2). Weights are dgbfi*rho with
        the dgbfi-only fallback at zero-mass nodes, clipped to the
        coincident-node range (slmmir_d2c.cpp:91-115)."""
        nt = q.shape[0]
        qf = q.reshape(nt, -1)
        wf = (self.F * rho).reshape(1, -1).astype(qf.dtype)
        Ff = self.F.reshape(-1).astype(qf.dtype)
        if self._use_pallas_dd(qf.dtype):
            cg = self._pallas_q_dd(wf, qf)
        elif self._use_pallas(qf.dtype):
            cg = self._pallas_q(wf, qf)
        else:
            # Two-stage weights: merge w once to find zero-mass nodes, then
            # blend per-slot (coincident slots share their node's den, so
            # den>0 nodes get EXACTLY the old w-weighted average while
            # den==0 nodes get the dgbfi fallback) - this removes the nt
            # extra `num0` merge rows the old formulation carried for the
            # fallback. One reciprocal replaces the nt per-tracer divides
            # (f64 division is emulated on TPU and dominates otherwise).
            den = self._merge_add(wf)
            w2 = jnp.where(den > 0, wf, Ff[None])
            addm = self._merge_add(jnp.concatenate([w2 * qf, w2], axis=0))
            num, den2 = addm[:nt], addm[nt]
            ming = jnp.concatenate([qf, -qf], axis=0)
            minm = self._merge_op(ming, jnp.minimum)
            mn, mx = minm[:nt], -minm[nt:]
            cg = num * (1.0 / den2)[None]
            cg = jnp.clip(cg, mn, mx)
        out = self._fix_q(cg, qf, wf[0], Ff)
        return out.reshape(q.shape)
