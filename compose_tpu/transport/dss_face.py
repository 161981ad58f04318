"""Face-grid DSS: O(perimeter) slice arithmetic instead of gathers.

The reference's D2Cer (methods/slmm/slmmir_d2c.{hpp,cpp}) loops a CSR map
over continuous nodes. The gather formulation in transport/dss.py already
avoids scatters, but it still issues one gather row per (continuous node x
<=4 coincident slots) - ~5.6 rows per cell at np=4 - and TPU gathers are
serialized per row, which makes DSS the largest fixed cost of the ISL step.

This module exploits the cubed-sphere structure instead: cells are numbered
(face, cy, cx) row-major and nodes (j, i) within a cell, so a DGLL field
reshapes for free to (6, ne, ne, np, np) and almost every coincidence is
between REGULAR SLICES:

  - x-pass: node (j, np-1) of cell (cy, cx) == node (j, 0) of (cy, cx+1);
  - y-pass: node (np-1, i) of (cy, cx) == node (0, i) of (cy+1, cx).

Because the coincident set of a cell-corner node is the tensor product of
its x-neighbors and y-neighbors, running the x-pass first and the y-pass on
its output accumulates the full 4-way sums/mins/maxes. Both passes touch
only O(ne^2 * np) edge slots. The only nodes the passes miss are the ones
on CUBE edges (two or three faces meet, ~12*ne*(np-1) of them); those are
fixed afterwards with the exact gather formula over their (<=4) coincident
slots - a few thousand rows instead of a few hundred thousand.

The construction is validated structurally at build time (union-find over
the pass-merged pairs vs. the mesh's d2c map), so any mesh whose numbering
deviates (e.g. subcell meshes) is rejected and the caller falls back to the
gather path. Results are deterministic (fixed pass order) and agree with
dss.py to roundoff (the summation order within a coincident set differs).
"""

import numpy as np

import jax.numpy as jnp


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


class FaceDss:
    """Precomputed face-grid DSS for a standard cubed-sphere mesh.

    build() returns None when the mesh numbering is not the standard
    (face, cy, cx, j, i) row-major layout (validated, not assumed).
    """

    def __init__(self, ne, np_, d2c_map_np, c2d_idx_np, c2d_mask_np, F):
        self.ne, self.np_ = ne, np_
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
        # den0 (sum of static weights over coincident slots) is static.
        Fm = self._merge_np(np.asarray(F).reshape(-1))
        self.den0 = jnp.asarray(Fm)

    # -- structural validation + factory ---------------------------------
    @staticmethod
    def build(mesh):
        """Return a FaceDss for `mesh`, or None if the numbering does not
        match the standard face-grid layout."""
        ne, np_ = mesh.ne, mesh.np_
        if 6 * ne * ne != mesh.ncell:
            return None
        d2c = np.asarray(mesh.dgll2cgll).reshape(-1)
        c2d_idx = np.asarray(mesh.c2d_idx)
        c2d_mask = np.asarray(mesh.c2d_mask)
        if not FaceDss._validate(ne, np_, d2c, c2d_idx, c2d_mask):
            return None
        return FaceDss(ne, np_, d2c, c2d_idx, c2d_mask, mesh.dgbfi_gll)

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
        is_fix = np.zeros(d2c_map.max() + 1, bool)
        is_fix[fix_nodes] = True
        for node in fix_nodes:
            slots = c2d_idx[node][c2d_mask[node]]
            for b in slots[1:]:
                union(slots[0], b)
        roots = np.array([find(a) for a in range(ndgll)])
        # Pass-derived classes must equal the mesh's coincidence classes.
        _, class_a = np.unique(roots, return_inverse=True)
        _, class_b = np.unique(d2c_map, return_inverse=True)
        perm_ok = True
        # Same partition <=> the pairing (class_a, class_b) is a bijection.
        pairs = class_a.astype(np.int64) * (class_b.max() + 1) + class_b
        perm_ok = (np.unique(pairs).size == np.unique(class_a).size
                   == np.unique(class_b).size)
        return bool(perm_ok)

    # -- merge passes ------------------------------------------------------
    def _xpass(self, a, op):
        # a: (6, ne, ne, np, np, ...lanes)
        L = a[:, :, :-1, :, -1]
        R = a[:, :, 1:, :, 0]
        c = op(L, R)
        a = a.at[:, :, :-1, :, -1].set(c)
        a = a.at[:, :, 1:, :, 0].set(c)
        return a

    def _ypass(self, a, op):
        D = a[:, :-1, :, -1, :]
        U = a[:, 1:, :, 0, :]
        c = op(D, U)
        a = a.at[:, :-1, :, -1, :].set(c)
        a = a.at[:, 1:, :, 0, :].set(c)
        return a

    def _merge(self, a, op=jnp.add):
        """Merge coincident intra-face slots of a (6,ne,ne,np,np,...lanes)
        array (cube-edge nodes are finished by the fix pass)."""
        return self._ypass(self._xpass(a, op), op)

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

    def _to5(self, x):
        """(..., ncell, np2) -> (6, ne, ne, np, np, lanes) with leading axes
        moved innermost (wide lanes for the fix gather/scatter)."""
        lead = x.shape[:-2]
        x5 = jnp.moveaxis(x.reshape(lead + self.shape5),
                          tuple(range(len(lead))),
                          tuple(range(-len(lead), 0)))
        return x5, lead

    def _from5(self, x5, lead):
        n = len(lead)
        if n:
            x5 = jnp.moveaxis(x5, tuple(range(-n, 0)), tuple(range(n)))
        return x5.reshape(lead + (6 * self.ne * self.ne * self.np_ ** 2,))

    # -- public ops --------------------------------------------------------
    def dss(self, field, clip_minmax=True):
        """DSS a (..., ncell, np2) field with the static dgbfi weights
        (dss.dss_gather equivalent; returns the same shape)."""
        m = self
        w = self.F.reshape(self.shape5)
        v5, lead = self._to5(field)
        wl = w[..., None] if lead else w
        num = self._merge(wl * v5)
        mn = self._merge(v5, jnp.minimum) if clip_minmax else None
        mx = self._merge(v5, jnp.maximum) if clip_minmax else None
        den = self.den0.reshape(self.shape5)
        den = den[..., None] if lead else den
        cg = num / den
        if clip_minmax:
            cg = jnp.clip(cg, mn, mx)
        out = self._from5(cg, lead)                   # (..., ndgll)
        # Exact fix for cube-edge nodes, lanes innermost.
        vflat = self._from5(v5, lead)
        outT = jnp.moveaxis(out, -1, 0)               # (ndgll, lanes...)
        vT = jnp.moveaxis(vflat, -1, 0)
        Ff = self.F.reshape(-1)
        vals = vT[self.fix_idx]                       # (nfix, 4, lanes...)
        wfix = jnp.where(self.fix_mask, Ff[self.fix_idx], 0.0)
        wfix = wfix.reshape(wfix.shape + (1,) * len(lead))
        numf = jnp.sum(wfix * vals, axis=1)
        denf = jnp.sum(wfix, axis=1)
        cgf = numf / denf
        if clip_minmax:
            mk = self.fix_mask.reshape(self.fix_mask.shape + (1,) * len(lead))
            cgf = jnp.clip(cgf,
                           jnp.min(jnp.where(mk, vals, jnp.inf), axis=1),
                           jnp.max(jnp.where(mk, vals, -jnp.inf), axis=1))
        upd = jnp.broadcast_to(cgf[:, None], vals.shape)
        outT = outT.at[self.fix_tgt.reshape(-1)].set(
            upd.reshape((-1,) + upd.shape[2:]), mode="drop")
        out = jnp.moveaxis(outT, 0, -1)
        return out.reshape(field.shape)

    def dss_q(self, rho, q):
        """Mixing-ratio DSS (dss.dss_q_gather_t equivalent).

        rho: (ncell, np2); q: (nt, ncell, np2). Weights are dgbfi*rho with
        the dgbfi-only fallback at zero-mass nodes, clipped to the
        coincident-node range (slmmir_d2c.cpp:91-115)."""
        nt = q.shape[0]
        w = (self.F * rho).reshape(self.shape5)
        q5, lead = self._to5(q)                       # (6,ne,ne,np,np,nt)
        num = self._merge(w[..., None] * q5)
        den = self._merge(w)[..., None]
        num0 = self._merge(self.F.reshape(self.shape5)[..., None] * q5)
        den0 = self.den0.reshape(self.shape5)[..., None]
        mn = self._merge(q5, jnp.minimum)
        mx = self._merge(q5, jnp.maximum)
        ok = den > 0
        cg = jnp.where(ok, num / jnp.where(ok, den, 1.0), num0 / den0)
        cg = jnp.clip(cg, mn, mx)
        out = self._from5(cg, lead)                   # (nt, ndgll)
        # Fix pass (exact formula over <=4 slots), tracer-innermost.
        qT = jnp.moveaxis(q.reshape(nt, -1), 0, -1)   # (ndgll, nt) originals
        Ff = self.F.reshape(-1)
        wf = Ff * rho.reshape(-1)
        vals = qT[self.fix_idx]                       # (nfix, 4, nt)
        wfix = jnp.where(self.fix_mask, wf[self.fix_idx], 0.0)[..., None]
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
        outT = jnp.moveaxis(out, 0, -1)               # (ndgll, nt)
        upd = jnp.broadcast_to(cgf[:, None], (cgf.shape[0], 4, nt))
        outT = outT.at[self.fix_tgt.reshape(-1)].set(
            upd.reshape(-1, nt), mode="drop")
        return jnp.moveaxis(outT, 0, -1).reshape(q.shape)
