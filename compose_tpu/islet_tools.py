"""Offline Islet basis derivation / verification tools.

Counterpart of /root/reference/methods/islet/: the research programs that
DERIVE the stabilized interpolation bases used by the transport core.
Covered here:

  - `isl_op`: assemble the 1-D periodic semi-Lagrangian advection operator
    for a nodal basis (the reference's 1-D ISL, methods/islet/islet_isl.cpp);
  - `MaxEigComputer.max_eig_amp`: max |eigenvalue| of the operator over a
    sweep of Courant offsets - the stability metric lambda_max
    (islet_maxeigcomp.{hpp,cpp}); batched through the native C++/LAPACK
    module (native/islet_native.cpp, built on demand, ctypes-loaded), with
    a numpy fallback;
  - `pum_metric`: lambda_max over randomly perturbed meshes
    (PerturbedUniformMeshMetric, islet_pum.{hpp,cpp});
  - accuracy metrics a_j / Lebesgue constant (islet_xnodes_metrics.{hpp,cpp}).

These run offline on the host (numpy; eigensolves in native threads) - the
same division of labor as the reference, where the search tools are CPU
programs whose OUTPUT (node subsets + weights) is baked into the transport
core (compose_tpu/basis.py).
"""

import ctypes
import os
import subprocess

import numpy as np

from . import basis as basis_mod

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "islet_native.cpp")
_LIB = os.path.join(_HERE, "native", "build", "libislet_native.so")

_native = None


def _load_native():
    """Build (if needed) and ctypes-load the native eigensolver."""
    global _native
    if _native is not None:
        return _native
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        os.makedirs(os.path.dirname(_LIB), exist_ok=True)
        lapack = "-llapack"
        if not os.path.exists("/usr/lib/x86_64-linux-gnu/liblapack.so"):
            lapack = "-l:liblapack.so.3"
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _LIB, lapack, "-pthread"]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB)
    lib.islet_spectral_radius.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int]
    lib.islet_spectral_radius.restype = None
    _native = lib
    return lib


def spectral_radius(mats, nthreads: int = 0):
    """Batched spectral radius of dense matrices (n_mats, n, n).

    Native C++/LAPACK threads when available; numpy fallback otherwise.
    """
    mats = np.ascontiguousarray(mats, dtype=np.float64)
    if mats.ndim == 2:
        mats = mats[None]
    n_mats, n, n2 = mats.shape
    assert n == n2
    try:
        lib = _load_native()
    except Exception:
        return np.array([np.max(np.abs(np.linalg.eigvals(m))) for m in mats])
    out = np.empty(n_mats, dtype=np.float64)
    lib.islet_spectral_radius(
        mats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_mats, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nthreads)
    if np.any(out < 0):  # LAPACK failure: fall back per matrix
        for i in np.nonzero(out < 0)[0]:
            out[i] = np.max(np.abs(np.linalg.eigvals(mats[i])))
    return out


# ----------------------------------------------------------------------------
# 1-D periodic ISL operator.

def isl_op(basis, ne: int, dx: float, mesh_x=None):
    """Assemble the 1-D periodic ISL advection operator A for `basis` on a
    mesh of `ne` cells covering [0, ne] (cell width 1 unless `mesh_x` gives
    explicit cell boundaries, len ne+1, for perturbed-mesh studies).

    dx is the advection displacement per step in mesh units (the Courant
    number). Unique nodes only (shared endpoints identified; N = ne*(np-1)).
    A[i, j] = basis_j evaluated at the departure point of node i.
    """
    np_ = basis.np
    xn = np.asarray(basis.x)  # in [-1, 1]
    if mesh_x is None:
        mesh_x = np.arange(ne + 1, dtype=np.float64)
    mesh_x = np.asarray(mesh_x, dtype=np.float64)
    L = mesh_x[-1] - mesh_x[0]
    width = np.diff(mesh_x)

    # Unique node coordinates: per cell, nodes 0..np-2 (last node == first of
    # the next cell); global index of (cell c, local k) = c*(np-1)+k mod N.
    N = ne * (np_ - 1)
    coords = np.empty(N)
    for c in range(ne):
        xl = mesh_x[c]
        coords[c * (np_ - 1):(c + 1) * (np_ - 1)] = (
            xl + (xn[:-1] + 1) * 0.5 * width[c])

    import jax.numpy as jnp
    A = np.zeros((N, N))
    dep = coords - dx
    dep = mesh_x[0] + np.mod(dep - mesh_x[0], L)
    cell = np.clip(np.searchsorted(mesh_x, dep, side="right") - 1, 0, ne - 1)
    a = 2 * (dep - mesh_x[cell]) / width[cell] - 1
    vals = np.asarray(basis.eval(jnp.asarray(a)))  # (N, np)
    for i in range(N):
        c = cell[i]
        for k in range(np_):
            j = (c * (np_ - 1) + k) % N
            A[i, j] += vals[i, k]
    return A


class MaxEigComputer:
    """Stability analysis: lambda_max over a Courant sweep
    (islet_maxeigcomp.hpp:13-41)."""

    def __init__(self, basis):
        self.basis = basis

    def max_eig_amp(self, ne: int, ndx: int = 64, mesh_x=None):
        """Max |eig| of the ISL operator over ndx Courant offsets in (0, 1)
        (integer parts are exact shifts and don't affect stability)."""
        dxs = (np.arange(ndx) + 0.5) / ndx
        mats = np.stack([isl_op(self.basis, ne, dx, mesh_x) for dx in dxs])
        return float(np.max(spectral_radius(mats)))


def bloch_max_eig_amp(basis, ne: int = 96, ndx: int = 64):
    """Bloch-wave stability analysis (islet_maxeigcomp.{hpp,cpp}, bloch
    namespace :165-252): on a UNIFORM mesh the 1-D ISL operator is block
    circulant, so its spectrum is the union over the ne wavenumbers
    mu = exp(2 pi i k / ne) of the (np-1)-dim eigenvalues of

        B(mu)[r, c] = mu^{s(r)} A[r, c] + (c == 0) mu^{s(r)+1} A[r, np-1]

    where A is the (np-1) x np kernel block (each interior node's basis row
    at its shifted ref coordinate, wrapped across the cell), and s(r) is 0
    for rows still in the cell (r < K) and 1 for wrapped rows. O(ne (np-1)^3)
    instead of one (ne (np-1))^3 eigensolve, so much larger ne sweeps are
    affordable. Returns max |lambda| over ndx Courant offsets in (0, 1)."""
    import jax.numpy as jnp
    np_ = basis.np
    xg = np.asarray(basis.x)
    npm1 = np_ - 1
    worst = 0.0
    ks = np.arange(ne)
    mus = np.exp(2j * np.pi * ks / ne)                   # (ne,)
    for dx in (np.arange(ndx) + 0.5) / ndx:
        # K = number of nodes still inside the cell after the shift
        # (bloch::get_K, islet_maxeigcomp.cpp:168-176).
        K = int(np.sum(xg + 2 * dx < 1))
        refs = xg[:npm1] + 2 * dx
        refs = np.where(refs >= 1, refs - 2, refs)
        A = np.asarray(basis.eval(jnp.asarray(refs)))    # (npm1, np)
        B = np.empty((ne, npm1, npm1), complex)
        B[:, :K, :] = A[None, :K, :npm1]
        B[:, K:, :] = mus[:, None, None] * A[None, K:, :npm1]
        B[:, :K, 0] += mus[:, None] * A[None, :K, npm1]
        B[:, K:, 0] += (mus * mus)[:, None] * A[None, K:, npm1]
        ev = np.linalg.eigvals(B)
        worst = max(worst, float(np.max(np.abs(ev))))
    return worst


class MetricsTracker:
    """Pareto filter over (accuracy metrics, PUM) candidates
    (islet_xnodes_metrics.{hpp,cpp}:84-188): nbin log-spaced PUM bins from
    1 down to machine eps; per bin, the best (a_1, a_2, a_inf) seen. A
    candidate is worth keeping if it improves any metric in any bin whose
    PUM level it meets - the search's replacement for a single scalar
    threshold."""

    nmet, nbin = 3, 30

    def __init__(self, np_: int = 0, very_strict: bool = False):
        eps = np.finfo(np.float64).eps
        fac = eps ** (1.0 / self.nbin)
        self.pum_bins = np.empty(self.nbin + 1)
        self.pum_bins[0] = 1.0
        for i in range(self.nbin):
            self.pum_bins[i + 1] = self.pum_bins[i] * fac
        self.best = np.full((self.nbin, self.nmet), np.inf)
        self.pum_max = 1.0
        self.pum_min = 1.0

    def set_pum_max(self, pum_max: float):
        assert 0 < pum_max <= 1
        self.pum_max = pum_max

    def acceptable_metrics(self, metrics) -> bool:
        """Could these metrics update SOME bin (before knowing the PUM)?"""
        return bool((np.asarray(metrics)[None, :] < self.best).any())

    def pum_to_accept(self, metrics) -> float:
        """The PUM a candidate with these metrics must beat to update."""
        m = np.asarray(metrics)
        for b in range(self.nbin):
            if (m < self.best[b]).any():
                return min(self.pum_max, float(self.pum_bins[b]))
        return 0.0

    def would_update(self, metrics, pum: float) -> bool:
        if pum > self.pum_max:
            return False
        b = 0
        while b < self.nbin - 1 and pum < self.pum_bins[b + 1]:
            b += 1
        return bool((np.asarray(metrics) < self.best[b]).any())

    def update(self, metrics, pum: float):
        m = np.asarray(metrics)
        updated = False
        for b in range(self.nbin):
            if pum > self.pum_bins[b]:
                break
            sel = m < self.best[b]
            if sel.any():
                self.best[b][sel] = m[sel]
                updated = True
        if updated:
            self.pum_min = min(self.pum_min, pum)

    def get_metrics(self, pum: float):
        b = 0
        while b < self.nbin and pum <= self.pum_bins[b]:
            b += 1
        return self.best[max(0, b - 1)].copy()


def pum_metric(basis, ne: int = 6, n_mesh: int = 8, ndx: int = 16,
               perturb: float = 0.25, seed: int = 0):
    """Perturbed-uniform-mesh stability metric lambda_max^PUM
    (islet_pum.{hpp,cpp}): max |eig| over randomly perturbed meshes x
    Courant offsets."""
    rng = np.random.default_rng(seed)
    worst = 0.0
    mec = MaxEigComputer(basis)
    for _ in range(n_mesh):
        x = np.arange(ne + 1, dtype=np.float64)
        x[1:-1] += perturb * (2 * rng.random(ne - 1) - 1)
        worst = max(worst, mec.max_eig_amp(ne, ndx, mesh_x=x))
    return worst


# ----------------------------------------------------------------------------
# Node-set accuracy metrics (islet_xnodes_metrics.{hpp,cpp}).

def lebesgue_constant(basis, nsamp: int = 1001):
    """Max over [-1,1] of sum_i |phi_i(x)|."""
    import jax.numpy as jnp
    xs = jnp.linspace(-1.0, 1.0, nsamp)
    v = np.asarray(basis.eval(xs))
    return float(np.max(np.sum(np.abs(v), axis=-1)))


class OffsetNodalBasis:
    """Ad-hoc GLL-node basis with caller-specified region windows - the
    search space of the reference's `search findnodal_given_bestosn`
    (methods/islet/search.cpp; string-defined bases in
    slmm_islet_string.cpp)."""

    def __init__(self, np_: int, regions):
        from . import basis as _b
        g = _b.GLL(np_)
        self.np = np_
        self.x = g.x
        self.w = g.w  # placeholder weights; the search scores stability
        self.regions = tuple(regions)

    def eval(self, x):
        from . import basis as _b
        subsets = [list(range(os, os + sub)) for (os, sub) in self.regions]
        return _b._regionwise_eval(self.x, subsets, x)


def search_offset_nodal(np_: int, ne: int = 5, ndx: int = 24,
                        tol: float = 1e-9, min_subnp: int = None):
    """Enumerate offset-nodal region configurations for `np_` GLL nodes and
    return the stable ones (lambda_max <= 1 + tol over the Courant sweep),
    sorted by the interpolation accuracy metric - a compact version of the
    reference's offline basis search (methods/islet/search.cpp;
    readme.txt:24-60 documents the output contract: configurations +
    stability/accuracy metrics).

    Returns a list of (regions, lambda_max, accuracy) tuples.
    """
    import itertools
    nreg = np_ // 2
    if min_subnp is None:
        min_subnp = max(2, np_ - 2)
    per_region = []
    for i in range(nreg):
        opts = []
        for sub in range(min_subnp, np_ + 1):
            for os in range(0, np_ - sub + 1):
                # The region [x_i, x_{i+1}] must be covered by the window
                # so nodal interpolation stays exact in-region.
                if os <= i and os + sub - 1 >= i + 1:
                    opts.append((os, sub))
        per_region.append(opts)
    out = []
    for regions in itertools.product(*per_region):
        b = OffsetNodalBasis(np_, regions)
        try:
            lam = MaxEigComputer(b).max_eig_amp(ne, ndx)
        except Exception:
            continue
        if lam <= 1 + tol:
            out.append((regions, lam, interp_error_metric(b)))
    out.sort(key=lambda r: r[2])
    return out


def interp_error_metric(basis, degree: int = None, nsamp: int = 501):
    """a_inf-style metric: worst-case interpolation error of sin(pi x)
    relative to its best approximation scale - a simple accuracy proxy for
    ranking node sets (the reference's a_1/a_2/a_inf metrics)."""
    import jax.numpy as jnp
    xs = jnp.linspace(-1.0, 1.0, nsamp)
    v = np.asarray(basis.eval(xs))
    xn = np.asarray(basis.x)
    f = np.sin(np.pi * np.asarray(xs))
    fn = np.sin(np.pi * xn)
    return float(np.max(np.abs(v @ fn - f)))


def _factorial(n):
    f = 1.0
    for i in range(2, n + 1):
        f *= i
    return f


def calc_xnodes_metrics(xnodes, subsets, nseg: int = 100):
    """The reference's exact a_1 / a_2 / a_inf node-set accuracy metrics
    (calc_xnodes_metrics, islet_xnodes_metrics.cpp:15-42): per left-half
    region, midpoint-rule integrals of |prod_i (x - x_active_i)| / subnp!,
    the Lagrange remainder magnitude of the region's sub-polynomial.
    subsets: per-region active node index lists (left half)."""
    xnodes = np.asarray(xnodes)
    np_ = len(xnodes)
    nph = np_ // 2
    a1 = a2 = 0.0
    ainf = 0.0
    for ireg in range(nph):
        center = (np_ % 2 == 0) and ireg == nph - 1
        xs_, xe = xnodes[ireg], xnodes[ireg + 1]
        active = np.asarray(subsets[ireg])
        subnp = len(active)
        x = xs_ + (np.arange(nseg) + 0.5) * (xe - xs_) / nseg
        f = np.prod(x[:, None] - xnodes[active][None, :], axis=1)
        fac = _factorial(subnp)
        scale = (1 if center else 2) * (xe - xs_) / fac / nseg
        a1 += scale * np.abs(f).sum()
        a2 += scale * (f * f).sum() / fac
        ainf = max(ainf, np.abs(f).max() / fac)
    return a1, np.sqrt(a2), ainf


def calc_lebesgue_consts(xnodes, subsets, nseg: int = 100):
    """L1/L2/Linf Lebesgue 'constants' of the region-wise basis
    (calc_lebesgue_consts, islet_xnodes_metrics.cpp:50-84)."""
    xnodes = np.asarray(xnodes)
    np_ = len(xnodes)
    nph = np_ // 2
    l1 = l2 = 0.0
    linf = 0.0
    for ireg in range(nph):
        center = (np_ % 2 == 0) and ireg == nph - 1
        xs_, xe = xnodes[ireg], xnodes[ireg + 1]
        active = np.asarray(subsets[ireg])
        x = xs_ + (np.arange(nseg) + 0.5) * (xe - xs_) / nseg
        xa = xnodes[active]
        f = np.zeros(nseg)
        for i in range(len(active)):
            g = np.ones(nseg)
            for j in range(len(active)):
                if j == i:
                    continue
                g *= (x - xa[j]) / (xa[i] - xa[j])
            f += np.abs(g)
        scale = (1 if center else 2) * (xe - xs_) / nseg
        l1 += scale * f.sum()
        l2 += scale * (f * f).sum()
        linf = max(linf, f.max())
    return l1, np.sqrt(l2), linf


class NodalSubsetBasis:
    """General nodal-subset basis on GLL nodes: per left-half region, an
    arbitrary active node subset (the search space of
    `search findnodal_given_bestosn`; cf. slmm_islet_string.cpp)."""

    def __init__(self, np_: int, subsets):
        g = basis_mod.GLL(np_)
        self.np = np_
        self.x = g.x
        self.subsets = tuple(tuple(s) for s in subsets)
        self.w = np.asarray(self.calc_weights())

    def eval(self, x):
        return basis_mod._regionwise_eval(self.x, list(self.subsets), x)

    def calc_weights(self):
        """Modified quadrature weights: per-region integrals of the basis
        functions, symmetrized (calc_weights,
        islet_xnodes_metrics.cpp:217-246)."""
        import jax.numpy as jnp
        qx, qw = np.polynomial.legendre.leggauss(7)
        xn = np.asarray(self.x)
        np_ = self.np
        integral = np.zeros(np_)
        for ireg in range(np_ - 1):
            x = 0.5 * (xn[ireg] + xn[ireg + 1]) \
                + 0.5 * (xn[ireg + 1] - xn[ireg]) * qx
            v = np.asarray(self.eval(jnp.asarray(x)))
            integral += 0.5 * (xn[ireg + 1] - xn[ireg]) * (qw @ v)
        for i in range(np_ // 2):
            o = np_ - i - 1
            integral[i] = integral[o] = 0.5 * (integral[i] + integral[o])
        return integral


def enumerate_nodal_candidates(np_: int, subnp_sig):
    """All general node-subset bases with the region signature `subnp_sig`
    (region i's subset must contain the region endpoints i, i+1 -
    NsbSearchAtom's constraint in search.cpp). Yields subset tuples."""
    import itertools

    per_region = []
    for i, sub in enumerate(subnp_sig):
        others = [k for k in range(np_) if k not in (i, i + 1)]
        per_region.append([tuple(sorted((i, i + 1) + extra))
                           for extra in itertools.combinations(others,
                                                               sub - 2)])
    return itertools.product(*per_region)


def evaluate_nodal_candidate(np_: int, subsets, stab_ne: int = 96,
                             stab_ndx: int = 24, tol: float = 1e-9,
                             pum_kw=None):
    """Stability (Bloch), weight positivity, accuracy metrics, and PUM for
    one node-subset basis - the per-candidate work of the reference's
    search loop. Returns None if unstable or weights are not positive."""
    b = NodalSubsetBasis(np_, subsets)
    if np.any(b.w <= 0):
        return None
    lam = bloch_max_eig_amp(b, ne=stab_ne, ndx=stab_ndx)
    if lam > 1 + tol:
        return None
    a1, a2, ainf = calc_xnodes_metrics(np.asarray(b.x), subsets)
    pum = pum_metric(b, **(pum_kw or dict(ne=4, n_mesh=3, ndx=8)))
    return dict(subsets=subsets, meam1=max(lam - 1.0, 0.0),
                a1=a1, a2=a2, ainf=ainf, pum=max(pum - 1.0, 0.0))


def search_nodal_given_bestosn(np_: int, ne: int = 5, ndx: int = 24,
                               tol: float = 1e-9, max_eval: int = 20000,
                               verbose: bool = True):
    """The reference's two-stage Islet basis search
    (`search findnodal_given_bestosn np`, methods/islet/search.cpp;
    output contract documented in methods/islet/readme.txt:24-60):

      1. enumerate offset-nodal-subset (o.n.s.) bases, keep the stable ones
         and take the best configuration's subnp signature;
      2. enumerate GENERAL node subsets with that signature (each region's
         subset must contain the region's endpoints and respect left-half
         symmetry), filter by stability (meam1 ~ eps over a Courant sweep),
         all-positive weights, and the PUM metric; rank by the a_1 metric.

    Returns (osn_results, nodal_results) where nodal_results is a list of
    dicts {subsets, meam1, wpos, a1, a2, ainf, pum}, best first.
    """
    import itertools

    osn = search_offset_nodal(np_, ne=ne, ndx=ndx, tol=tol)
    if not osn:
        return [], []
    best_regions = osn[0][0]
    subnp_sig = [sub for (_, sub) in best_regions]
    if verbose:
        print(f"np {np_:3d}")
        for (regions, lam, acc) in osn[:4]:
            subnp = " ".join(str(s) for (_, s) in regions)
            offst = " ".join(str(o) for (o, _) in regions)
            print(f"meam1 {max(lam - 1, 0):.1e} | np {np_:3d} "
                  f"subnp {subnp} offst {offst}")

    nreg = np_ // 2
    per_region = []
    for i in range(nreg):
        sub = subnp_sig[i]
        opts = []
        # Each region's subset must include the region endpoints i, i+1
        # (nodal interpolation must be exact at the region boundary).
        others = [k for k in range(np_) if k not in (i, i + 1)]
        for extra in itertools.combinations(others, sub - 2):
            opts.append(tuple(sorted((i, i + 1) + extra)))
        per_region.append(opts)

    results = []
    count = 0
    total = int(np.prod([len(o) for o in per_region]))
    for subsets in itertools.product(*per_region):
        count += 1
        if count > max_eval:
            break
        b = NodalSubsetBasis(np_, subsets)
        if np.any(b.w <= 0):
            continue
        a1, a2, ainf = calc_xnodes_metrics(np.asarray(b.x), subsets)
        try:
            lam = MaxEigComputer(b).max_eig_amp(ne, ndx)
        except Exception:
            continue
        if lam > 1 + tol:
            continue
        pum = pum_metric(b, ne=min(ne, 4), n_mesh=3, ndx=8)
        if pum > 1 + 1e-6:
            continue
        results.append(dict(subsets=subsets, meam1=max(lam - 1.0, 0.0),
                            wpos=True, a1=a1, a2=a2, ainf=ainf,
                            pum=max(pum - 1.0, 0.0)))
    results.sort(key=lambda r: r["a1"])
    if verbose:
        print(f"count {total}")
        print(f"NsbSearchAtom::eval {min(count, max_eval)}/{total}")
        for r in results[:8]:
            nodes = " | ".join(" ".join(str(n) for n in s)
                               for s in r["subsets"])
            subnp = " ".join(str(len(s)) for s in r["subsets"])
            print(f"meam1 {r['meam1']:9.2e} w>0 1 npm {r['a1']:.2e} "
                  f"{r['a2']:.2e} {r['ainf']:.2e} pum {r['pum']:9.2e} | "
                  f"np {np_:3d} subnp {subnp} nodes | {nodes}")
    return osn, results
