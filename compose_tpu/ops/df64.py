"""Double-float (two-float32) arithmetic for TPU Pallas kernels.

TPU VPUs have no native f64: XLA emulates f64 with f32-pair ("double-double
float", df64) arithmetic, but the emulated ops frequently compile into long
unfused kernel chains (the round-5 profile attributed over half the ISL step
to them). These helpers implement the same pair arithmetic EXPLICITLY over
jnp f32 ops, so whole f64 phases (DSS merges, the cell-local limiter) can be
fused into single VMEM-resident Pallas kernels.

Representation: x ~ hi + lo with |lo| <= 0.5 ulp(hi) (canonical pair).
Splitting an f64 x as hi = f32(x), lo = f32(x - hi) keeps ~49 mantissa bits;
the sloppy add below carries a worst-case relative error ~2^-47, far inside
the invariants budget (mass 1e-12, the bounds clip is exact by construction:
comparisons on canonical pairs are lexicographic and selects return inputs
verbatim).

Algorithms: Knuth two-sum, Dekker split/two-product (12-bit f32 split; XLA's
FMA contraction can only make the error terms MORE exact), long division via
one quotient-refinement step. References: Dekker 1971; Hida/Li/Bailey QD.

All functions take/return (hi, lo) tuples of same-shape f32 arrays and are
plain jnp - usable inside Pallas kernels and in ordinary XLA (unit tests run
them on CPU against f64 ground truth).
"""

import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 for f32 Dekker splits


def two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def split(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def add(x, y):
    """(hi,lo) + (hi,lo), accurate (QD ieee_add): ~2 ulp relative always,
    including under cancellation (the sloppy one-two_sum variant has only an
    ABSOLUTE error bound, which is not good enough for the limiter's
    bound-difference arithmetic)."""
    xh, xl = x
    yh, yl = y
    sh, se = two_sum(xh, yh)
    th, te = two_sum(xl, yl)
    se = se + th
    sh, se = quick_two_sum(sh, se)
    se = se + te
    return quick_two_sum(sh, se)


def sub(x, y):
    yh, yl = y
    return add(x, (-yh, -yl))


def mul(x, y):
    xh, xl = x
    yh, yl = y
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(p, e)


def mul_f32(x, y32):
    """(hi,lo) * plain-f32."""
    xh, xl = x
    p, e = two_prod(xh, y32)
    e = e + xl * y32
    return quick_two_sum(p, e)


def prod_f32(a32, b32):
    """Exact product of two plain-f32 values as a pair."""
    return two_prod(a32, b32)


def div(x, y):
    """(hi,lo) / (hi,lo) via quotient refinement (~2^-44 relative)."""
    xh, xl = x
    yh, yl = y
    q1 = xh / yh
    # r = x - q1*y
    ph, pe = two_prod(q1, yh)
    pe = pe + q1 * yl
    rh, rl = add((xh, xl), (-ph, -pe))
    q2 = rh / yh
    return quick_two_sum(q1, q2)


def neg(x):
    return -x[0], -x[1]


def lt(x, y):
    """Lexicographic < on canonical pairs == f64 <."""
    return (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] < y[1]))


def le(x, y):
    return (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] <= y[1]))


def gt_zero(x):
    return (x[0] > 0) | ((x[0] == 0) & (x[1] > 0))


def select(c, x, y):
    return jnp.where(c, x[0], y[0]), jnp.where(c, x[1], y[1])


def max_(x, y):
    return select(lt(x, y), y, x)


def min_(x, y):
    return select(lt(x, y), x, y)


def clip(x, lo, hi):
    return min_(max_(x, lo), hi)


def zeros_like(x):
    z = jnp.zeros_like(x[0])
    return z, z


def from_f32(a32):
    return a32, jnp.zeros_like(a32)


def split_f64(x64):
    """f64 array -> (hi, lo) f32 pair (outside kernels)."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def join_f64(x):
    """(hi, lo) -> f64. Exact: hi and lo are f32 values whose f64 sum is
    representable. (Round-tripping an f64 through split/join keeps ~49
    mantissa bits - the pair's precision, not full f64.)"""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)
