"""Fused TPU kernels for the ISL tracer-CDR region (filter=caas,
limiter=caas).

Counterpart semantics: isl_cdr (slmmir_remapper_isl.cpp:1292-1455) with the
global CAAS redistributor (slmm_spf.cpp:733-771) and the cell-local
clip-and-sum limiter (slmm_spf.cpp:245-303), followed by the mixing-ratio
DSS (slmmir_d2c.cpp:91-120).

Why: the round-5 in-step ablation attributed ~2.3 ms to the cell-local
limiter and ~1.9 ms to the global redistribute at ne30/np4/nt40 - all of it
kernel fragmentation of emulated-f64 chains, not arithmetic (the same math
isolated runs in ~0.04 ms). These kernels run the identical algorithm
VMEM-resident in explicit double-float (ops/df64.py):

  - glbl_caas_tpu: the global CAAS over cells, one dispatch, row-fold pair
    sums by aligned lane-halving.
  - limit_dss_tpu: cell-local CAAS (per-cell sums via in-group suffix
    rolls + select broadcast) fused with the face-grid DSS merge passes of
    transport/dss_face.py, one dispatch; the exact-gather cube-edge fix
    stays outside in f64 (O(edge) work, fuses with the join).

Bounds remain exact: every clip/select picks pair values verbatim
(lexicographic compares == f64 compares on canonical pairs). Mass rounding
is df64 (~1e-14 relative) instead of f64; the invariants budget (1e-12
mass, 5e-13 bounds) is validated in-situ by tools/exp_r5_dd_check.py and
the TPU invariants probe in tools/exp_r5_invariants.py.

These paths are TPU-only and single-device-only; CPU tests and the sharded
step keep the reference-parity f64 XLA formulation.
"""

import functools

import jax
import jax.numpy as jnp

from ..ops import df64

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover - cpu-only environments
    pl = pltpu = None


_ROWS = 8  # f32 sublane multiple per kernel program


def available():
    return pl is not None and jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Global CAAS over cells (spf.glbl_caas semantics, df64).

@functools.lru_cache(maxsize=None)
def _glbl_caas_kernel(ncp, nrow):
    """One program: (nrow, ncp) per-cell records; lane-fold pair sums."""

    def rowsum(x):
        # Aligned halving fold: ncp is a power of two (padded outside).
        h, l = x
        m = ncp
        while m > 1:
            m //= 2
            h, l = df64.add((h[:, :m], l[:, :m]), (h[:, m:2 * m], l[:, m:2 * m]))
        return h, l  # (nrow, 1)

    def kernel(mn_h, mn_l, ms_h, ms_l, mx_h, mx_l, ex_h, ex_l,
               out_h, out_l):
        mn = (mn_h[...], mn_l[...])
        ms = (ms_h[...], ms_l[...])
        mx = (mx_h[...], mx_l[...])
        z = jnp.zeros_like(ms[0])
        below = df64.lt(ms, mn)
        above = df64.lt(mx, ms)
        delta = df64.select(below, df64.sub(mn, ms),
                            df64.select(above, df64.sub(mx, ms), (z, z)))
        msd = df64.add(ms, delta)
        # ex is the SOURCE total; m = ex - sum(mass + delta) equals the
        # reference's extra - sum(delta) with extra = src - sum(mass)
        # (glbl_caas_gsum, transport/spf.py) without materializing the
        # target total outside the kernel.
        ex = (ex_h[:, 0:1], ex_l[:, 0:1])
        m = df64.sub(ex, rowsum(msd))               # (nrow, 1)
        # v_up = 0 where mass >= max else max - (mass+delta); v_dn likewise.
        ge_mx = ~df64.lt(ms, mx)
        le_mn = ~df64.lt(mn, ms)
        v_up = df64.select(ge_mx, (z, z), df64.sub(mx, msd))
        v_dn = df64.select(le_mn, (z, z), df64.sub(msd, mn))
        up = df64.gt_zero(m)
        upb = jnp.broadcast_to(up, ms[0].shape)
        v = df64.select(upb, v_up, v_dn)
        vsum = rowsum(v)
        vnz = (vsum[0] != 0) | (vsum[1] != 0)
        one = jnp.ones_like(vsum[0])
        fac = df64.div(m, df64.select(vnz, vsum, (one, jnp.zeros_like(one))))
        fac = (jnp.where(vnz, fac[0], 0.0), jnp.where(vnz, fac[1], 0.0))
        facb = (jnp.broadcast_to(fac[0], ms[0].shape),
                jnp.broadcast_to(fac[1], ms[0].shape))
        out = df64.add(msd, df64.mul(facb, v))
        out_h[...] = out[0]
        out_l[...] = out[1]

    return kernel


def glbl_caas_pairs(mn_pair, ms_pair, mx_pair, src_total):
    """Redistributed per-cell masses, df64 Pallas, pair I/O.

    mn/ms/mx: ((nt, ncell) hi, lo) f32 record pairs; src_total: (nt,) f64
    SOURCE mass totals (the redistribute target: out sums to src_total per
    tracer). Returns the (hi, lo) (nt, ncell) pair."""
    nt, ncell = ms_pair[0].shape
    ncp = 1
    while ncp < ncell:
        ncp *= 2
    ntp = -(-nt // _ROWS) * _ROWS

    def prep(x):
        return (jnp.pad(x[0], ((0, ntp - nt), (0, ncp - ncell))),
                jnp.pad(x[1], ((0, ntp - nt), (0, ncp - ncell))))

    mn_h, mn_l = prep(mn_pair)
    ms_h, ms_l = prep(ms_pair)
    mx_h, mx_l = prep(mx_pair)
    exh, exl = df64.split_f64(src_total)
    ex_h = jnp.pad(jnp.broadcast_to(exh[:, None], (nt, 128)),
                   ((0, ntp - nt), (0, 0)))
    ex_l = jnp.pad(jnp.broadcast_to(exl[:, None], (nt, 128)),
                   ((0, ntp - nt), (0, 0)))
    kern = _glbl_caas_kernel(ncp, _ROWS)
    blk = pl.BlockSpec((_ROWS, ncp), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    exb = pl.BlockSpec((_ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    f32 = jnp.float32
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((ntp, ncp), f32),
                       jax.ShapeDtypeStruct((ntp, ncp), f32)),
            grid=(ntp // _ROWS,),
            in_specs=[blk] * 6 + [exb, exb],
            out_specs=(blk, blk),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(mn_h, mn_l, ms_h, ms_l, mx_h, mx_l, ex_h, ex_l)
    return oh[:nt, :ncell], ol[:nt, :ncell]


# ---------------------------------------------------------------------------
# Pair-arithmetic XLA glue: per-cell records and the cube-edge fix pass.
# These are plain f32 jnp chains (XLA fuses them well, unlike emulated f64).

def pair_cellsum(x_pair, np2):
    """Pair sum over aligned np2-groups of the last axis: ((..., n) hi/lo)
    -> ((..., n/np2) hi/lo), via halving folds (np2 padded to a power of
    two with zeros if needed)."""
    h, l = x_pair
    lead = h.shape[:-1]
    h = h.reshape(lead + (-1, np2))
    l = l.reshape(lead + (-1, np2))
    m = 1
    while m < np2:
        m *= 2
    if m != np2:
        h = jnp.pad(h, [(0, 0)] * len(lead) + [(0, 0), (0, m - np2)])
        l = jnp.pad(l, [(0, 0)] * len(lead) + [(0, 0), (0, m - np2)])
    while m > 1:
        m //= 2
        h, l = df64.add((h[..., :m], l[..., :m]),
                        (h[..., m:2 * m], l[..., m:2 * m]))
    return h[..., 0], l[..., 0]


def records_pairs(rhom_pair, q_tgt32, qmn_pair, qmx_pair, np2):
    """Per-cell CDR records in pair arithmetic (spf.record semantics):
    rhom_pair: ((n,) hi/lo) per-node masses F*rho; q_tgt32: (nt, n) f32
    exact target ratios; qmn/qmx: ((nt, n) hi/lo) node bounds.
    Returns (Cmin, Cmass, Cmax) as (nt, ncell) pairs."""
    rh = (rhom_pair[0][None], rhom_pair[1][None])
    Cmass = pair_cellsum(df64.mul_f32(rh, q_tgt32), np2)
    Cmin = pair_cellsum(df64.mul(rh, qmn_pair), np2)
    Cmax = pair_cellsum(df64.mul(rh, qmx_pair), np2)
    return Cmin, Cmass, Cmax


def fix_q_pairs(face_dss, cg_pair, qn_pair, w_pair, F_pair):
    """Cube-edge exact-gather fix (FaceDss._fix_q) in pair arithmetic:
    overwrite the fix nodes of cg with the w-weighted (F-fallback) average
    of qn over their coincident slots, clipped to the slot range. All
    (nt, n) / (n,) pairs; returns the fixed (nt, n) pair."""
    idx = face_dss.fix_idx                      # (nfix, 4)
    mask = face_dss.fix_mask
    mk = mask[..., None]

    def gather_nodes(p):
        # (nt, n) pair -> (nfix, 4, nt) pair, tracer-innermost.
        return (p[0].T[idx], p[1].T[idx])

    vals = gather_nodes(qn_pair)

    def gather_w(p):
        # 0.0 is a WEAK scalar: stays f32 (a concrete jnp.zeros(()) would
        # promote the pair to f64, whose Dekker splits the f32 splitter
        # cannot handle).
        gh = jnp.where(mask, p[0][idx], 0.0)[..., None]
        gl = jnp.where(mask, p[1][idx], 0.0)[..., None]
        return gh, gl

    wfix = gather_w(w_pair)
    w0fix = gather_w(F_pair)

    def sum4(p):
        h, l = p
        acc = (h[:, 0], l[:, 0])
        for k in range(1, 4):
            acc = df64.add(acc, (h[:, k], l[:, k]))
        return acc

    num = sum4(df64.mul(wfix, vals))
    den = sum4(wfix)
    num0 = sum4(df64.mul(w0fix, vals))
    den0 = sum4(w0fix)
    ok = den[0] > 0
    one = jnp.ones_like(den[0])
    cgf = df64.select(ok,
                      df64.div(num, df64.select(ok, den, (one, 0 * one))),
                      df64.div(num0, den0))
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    lo_h = jnp.where(mk, vals[0], big)
    lo_l = jnp.where(mk, vals[1], 0.0)
    hi_h = jnp.where(mk, vals[0], -big)
    hi_l = jnp.where(mk, vals[1], 0.0)
    mn = (lo_h[:, 0], lo_l[:, 0])
    mx = (hi_h[:, 0], hi_l[:, 0])
    for k in range(1, 4):
        mn = df64.min_(mn, (lo_h[:, k], lo_l[:, k]))
        mx = df64.max_(mx, (hi_h[:, k], hi_l[:, k]))
    cgf = df64.clip(cgf, mn, mx)
    # Scatter to every valid slot of each fix node (masked lanes target
    # out-of-bounds and drop).
    nt = qn_pair[0].shape[0]
    tgt = face_dss.fix_tgt.reshape(-1)
    upd_h = jnp.broadcast_to(cgf[0][:, None], (cgf[0].shape[0], 4, nt))
    upd_l = jnp.broadcast_to(cgf[1][:, None], (cgf[1].shape[0], 4, nt))
    oh = cg_pair[0].T.at[tgt].set(upd_h.reshape(-1, nt), mode="drop").T
    ol = cg_pair[1].T.at[tgt].set(upd_l.reshape(-1, nt), mode="drop").T
    return oh, ol


# ---------------------------------------------------------------------------
# Cell-local CAAS limiter kernel (the DSS merges run in the dss_face df64
# kernel, fed pairs directly - two dispatches keep each under the VMEM cap).

@functools.lru_cache(maxsize=None)
def _limit_kernel(n, np2, nrow):
    n, np2 = int(n), int(np2)

    def roll_pair(a, s):
        return (pltpu.roll(a[0], s, 1), pltpu.roll(a[1], s, 1))

    def cellsum(x, off):
        """Per-cell (aligned np2-lane-group) pair sums, broadcast to every
        lane of the group. Gather phase: lane 0 of each group accumulates
        its in-group suffix chain (its dependency cone never crosses the
        group boundary); broadcast phase: pure selects."""
        s = x
        k = 1
        while k < np2:
            s = df64.add(s, roll_pair(s, n - k))  # lane i += lane i+k
            k *= 2
        z = jnp.zeros_like(s[0])
        s = (jnp.where(off == 0, s[0], z), jnp.where(off == 0, s[1], z))
        k = 1
        while k < np2:
            t = roll_pair(s, k)                   # lane i gets lane i-k
            take = (off >= k) & (off < 2 * k)
            s = df64.select(take, t, s)
            k *= 2
        return s

    def kernel(Fh_ref, Fl_ref, rh_ref, rl_ref, q_ref, qmn_h, qmn_l,
               qmx_h, qmx_l, b_h, b_l, qn_h, qn_l):
        off = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % np2
        F = (Fh_ref[...], Fl_ref[...])
        rho = (rh_ref[...], rl_ref[...])
        rhom = df64.mul(F, rho)                   # (1, n) per-node masses
        y = df64.from_f32(q_ref[...])
        xlo = (qmn_h[...], qmn_l[...])
        xhi = (qmx_h[...], qmx_l[...])
        b = (b_h[...], b_l[...])

        # cell-local CAAS (ops/local_qp.caas, clip=True)
        x = df64.clip(y, xlo, xhi)
        ax = df64.mul(rhom, x)
        s = cellsum(ax, off)
        dm = df64.sub(b, s)
        dhi = df64.sub(xhi, x)
        dlo = df64.sub(x, xlo)
        fh = cellsum(df64.mul(rhom, dhi), off)
        fl = cellsum(df64.mul(rhom, dlo), off)
        up = df64.gt_zero(dm)
        fac = df64.select(up, fh, fl)
        facpos = df64.gt_zero(fac)
        one = jnp.ones_like(fac[0])
        scale = df64.div(dm, df64.select(facpos, fac,
                                         (one, jnp.zeros_like(one))))
        scale = (jnp.where(facpos, scale[0], 0.0),
                 jnp.where(facpos, scale[1], 0.0))
        dirn = df64.select(up, dhi, dlo)
        x = df64.add(x, df64.mul(scale, dirn))
        x = df64.clip(x, xlo, xhi)
        # zero-density nodes take the lower bound (isl.py q_new select).
        rzero = (rho[0] == 0) & (rho[1] == 0)
        q_new = df64.select(rzero, xlo, x)
        qn_h[...] = q_new[0]
        qn_l[...] = q_new[1]

    return kernel


def limit_pairs(face_dss, q_tgt32, F_pair, rho_pair, qmn_pair, qmx_pair,
                b_pair):
    """Cell-local CAAS limiter kernel, pair I/O. q_tgt32: (nt, n) f32 (the
    f32-interp target ratios, exactly representable); F_pair/rho_pair:
    ((n,) hi/lo); qmn/qmx: ((nt, n) hi/lo) node bounds; b_pair: ((nt,
    ncell) hi/lo) per-cell target masses. Returns the limited (nt, n)
    (hi, lo) pair (zero-density nodes at the lower bound)."""
    nt, n = q_tgt32.shape
    np2 = face_dss.np_ * face_dss.np_
    B = _ROWS
    ntp = -(-nt // B) * B
    Fh, Fl = F_pair[0].reshape(1, -1), F_pair[1].reshape(1, -1)
    rh, rl = rho_pair[0].reshape(1, -1), rho_pair[1].reshape(1, -1)
    bh = jnp.repeat(b_pair[0], np2, axis=-1)
    bl = jnp.repeat(b_pair[1], np2, axis=-1)

    def padr(x):
        return jnp.pad(x, ((0, ntp - nt), (0, 0))) if ntp != nt else x

    q32 = padr(q_tgt32)
    qmnh, qmnl = padr(qmn_pair[0]), padr(qmn_pair[1])
    qmxh, qmxl = padr(qmx_pair[0]), padr(qmx_pair[1])
    bh, bl = padr(bh), padr(bl)
    kern = _limit_kernel(n, np2, B)
    f32 = jnp.float32
    row = pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((B, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        qnh, qnl = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((ntp, n), f32),) * 2,
            grid=(ntp // B,),
            in_specs=[row] * 4 + [blk] * 7,
            out_specs=(blk,) * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(Fh, Fl, rh, rl, q32, qmnh, qmnl, qmxh, qmxl, bh, bl)
    return qnh[:nt], qnl[:nt]
