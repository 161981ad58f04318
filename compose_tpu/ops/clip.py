"""Batched spherical Sutherland-Hodgman polygon clipping.

Counterpart of /root/reference/siqk/siqk_intersect.hpp (sh::clip_against_edge
/ clip_against_poly) and SphereGeometry::inside/intersect
(siqk_geometry.hpp:176-206). The reference clips one polygon at a time with
early exits; here every (target cell, source candidate) pair clips in
lockstep with fixed-size vertex buffers (max_nvert = 8, the slmm setting) and
masked emission - a branch-free formulation that vmaps/jits into one fused
kernel over millions of pairs.

Precision notes carried over from the reference:
  - inside(v) = n . (v - a) >= 0 anchored at an edge point a, so the edge's
    own endpoints test exactly 'on' (siqk_geometry.hpp:177-181);
  - the intersection parameter is clamped to [0, 1] and the point is
    renormalized to the sphere (siqk_geometry.hpp:183-206).
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import sphere

MAX_NVERT = 8


def _clip_one_edge(verts, n, ce1, cen):
    """One Sutherland-Hodgman pass against the half-space with inward normal
    `cen` anchored at `ce1`. verts: (..., 8, 3); n: (...,) int32;
    ce1, cen: (..., 3). Returns (verts', n')."""
    idx = jnp.arange(MAX_NVERT)
    valid = idx < n[..., None]                               # (..., 8)
    prev_idx = jnp.where(idx == 0, jnp.maximum(n - 1, 0)[..., None],
                         idx - 1)
    s = jnp.take_along_axis(verts, prev_idx[..., None], axis=-2)
    p = verts
    d_p = sphere.dot(cen[..., None, :], p - ce1[..., None, :])
    d_s = sphere.dot(cen[..., None, :], s - ce1[..., None, :])
    in_p = d_p >= 0
    in_s = d_s >= 0

    # Intersection of chord s->p with the great circle (clamped lerp).
    num = sphere.dot(cen[..., None, :], ce1[..., None, :] - s)
    den = sphere.dot(cen[..., None, :], p - s)
    alpha = jnp.where((num == 0) | (den == 0), 0.0,
                      num / jnp.where(den == 0, 1.0, den))
    alpha = jnp.clip(alpha, 0.0, 1.0)
    raw = s + alpha[..., None] * (p - s)
    nrm = sphere.norm(raw)
    inter = raw / jnp.where(nrm == 0, 1.0, nrm)[..., None]

    # Emission slots: per input vertex j, slot 2j = intersection (when the
    # edge s->p crosses), slot 2j+1 = p (when p is inside). This reproduces
    # the reference's emit order (clip_against_edge, siqk_intersect.hpp:50-81).
    emit_int = valid & (in_p != in_s)
    emit_p = valid & in_p
    # Zero out non-emitting slots so padding garbage (incl. NaN from
    # degenerate intersections) cannot leak through the masked reduction.
    inter = jnp.where(emit_int[..., None], inter, 0.0)
    p = jnp.where(emit_p[..., None], p, 0.0)
    flags = jnp.stack([emit_int, emit_p], axis=-1).reshape(
        emit_int.shape[:-1] + (2 * MAX_NVERT,))
    vals = jnp.stack([inter, p], axis=-2).reshape(
        inter.shape[:-2] + (2 * MAX_NVERT, 3))
    pos = jnp.cumsum(flags, axis=-1) - 1                     # (..., 16)
    keep = flags & (pos < MAX_NVERT)
    onehot = (pos[..., None] == jnp.arange(MAX_NVERT)) & keep[..., None]
    out = jnp.einsum('...sk,...sd->...kd', onehot.astype(verts.dtype), vals)
    n_out = jnp.minimum(jnp.sum(flags, axis=-1), MAX_NVERT).astype(n.dtype)
    return out, n_out


@jax.jit
def clip_against_poly(clip_verts, clip_nmls, poly, n):
    """Clip `poly` (..., 8, 3) with `n` (...,) valid vertices against the
    4-edge spherical polygon `clip_verts` (..., 4, 3) with inward edge
    normals `clip_nmls` (..., 4, 3). Returns (verts, n_out); n_out == 0
    means empty intersection."""
    for e in range(4):
        poly, n = _clip_one_edge(poly, n, clip_verts[..., e, :],
                                 clip_nmls[..., e, :])
    return poly, n


@partial(jax.jit, static_argnames=("nq",))
def polygon_area(verts, n, bary, qw, nq: int):
    """Area of the (possibly empty) clipped polygons by triangle-fan
    quadrature: sum over triangles (v0, vk, vk+1), k = 1..n-2
    (siqk sh::clip + calc_tri_jacobian usage in siqk_test.cpp)."""
    total = jnp.zeros(n.shape, verts.dtype)
    for k in range(1, MAX_NVERT - 1):
        act = k + 1 < n
        jac, _ = sphere.tri_jacobian(
            verts[..., 0, :][..., None, :],
            verts[..., k, :][..., None, :],
            verts[..., k + 1, :][..., None, :],
            bary[None, :, :])
        contrib = 0.5 * jnp.sum(qw * jac, axis=-1)
        total = total + jnp.where(act, contrib, 0.0)
    return total
