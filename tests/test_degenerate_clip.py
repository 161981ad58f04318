"""Degenerate-geometry clipping stress suite + zero-flow T==M check.

Ports the siqk acceptance sweep (/root/reference/siqk/siqk_runtests.py:13-33,
siqk_test.cpp:414-449): overlap the cube-sphere mesh with a rotated copy of
itself for rotation angles swept over 17 decades down to 4.2e-17 (including
exactly 0 - fully coincident edges), clip EVERY (advected, Eulerian) cell
pair with ops/clip.py, and require the summed overlap area to equal 4*pi to
rel 1e-8. The near-zero angles exercise the degenerate branches (edges
coincident to 1 ulp, intersections at vertices); the large ones exercise
arbitrary overlap topologies.

The reference's planar-mesh variant (testno 0) is waived: planar geometry
exists in siqk only as a test double; this build's clipping is sphere-native
end to end, and the same offset sweep runs here on the sphere.

The second half ports the EXPENSIVE_CHECKS internal verification
RemapData::compare_MT (/root/reference/methods/slmm/slmmir_remap_data.cpp:
418-433): under zero flow the mixed mass matrix's diagonal blocks must
reproduce the quadrature mass matrix, rd(M, T) small; and the T pattern
must be symmetric (the transpose-graph check, slmmir_remapper.cpp:136-151).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compose_tpu.mesh import cubed_sphere, ir_data
from compose_tpu.ops import clip, quadrature

ANGLES = [0.0] + [4.2 * 10.0 ** f for f in range(-17, 0, 2)]
AXIS = np.array([0.1, -0.3, 0.2])


def _rotation(axis, angle):
    a = axis / np.linalg.norm(axis)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


@pytest.fixture(scope="module")
def overlap_setup():
    mesh = cubed_sphere.build(3, 4)
    ird = ir_data.build(mesh)
    ncell = mesh.ncell
    clip_v = ird.vert_xyz[ird.cell2vert]            # (ncell, 4, 3)
    nmls = ird.edge_nmls
    tgt = np.repeat(np.arange(ncell), ncell)
    src = np.tile(np.arange(ncell), ncell)
    bary, qw = quadrature.get_coef(20)
    jb, jqw = jnp.asarray(bary), jnp.asarray(qw)

    @jax.jit
    def total_area(adv_vert):
        adv_cells = adv_vert[ird.cell2vert]         # (ncell, 4, 3)
        poly = jnp.concatenate(
            [adv_cells, jnp.zeros_like(adv_cells)], axis=-2)  # (ncell, 8, 3)
        n0 = jnp.full((ncell,), 4, jnp.int32)
        vo, no = clip.clip_against_poly(
            clip_v[tgt], nmls[tgt], poly[src], n0[src])
        areas = clip.polygon_area(vo, no, jb, jqw, qw.shape[0])
        return jnp.sum(areas)

    return ird, total_area


@pytest.mark.parametrize("angle", ANGLES,
                         ids=[f"angle={a:.1e}" for a in ANGLES])
def test_overlap_area_4pi_under_degenerate_rotation(overlap_setup, angle):
    ird, total_area = overlap_setup
    R = jnp.asarray(_rotation(AXIS, angle))
    adv = ird.vert_xyz @ R.T
    adv = adv / jnp.linalg.norm(adv, axis=-1, keepdims=True)
    a = float(total_area(adv))
    rel = abs(a - 4 * np.pi) / (4 * np.pi)
    assert rel < 1e-8, (angle, rel)


def test_overlap_area_4pi_under_degenerate_translation(overlap_setup):
    """The translation analogue of the sweep (xlates in siqk_runtests.py):
    on the sphere a small translation of the mesh is a small rotation about
    an equatorial axis; sweep the same magnitudes about a different axis
    than the rotation test to vary which edges degenerate."""
    ird, total_area = overlap_setup
    for mag in (4.2e-17, 4.2e-11, 4.2e-5, 4.2e-2):
        R = jnp.asarray(_rotation(np.array([0.0, 1.0, 0.0]), mag))
        adv = ird.vert_xyz @ R.T
        adv = adv / jnp.linalg.norm(adv, axis=-1, keepdims=True)
        a = float(total_area(adv))
        rel = abs(a - 4 * np.pi) / (4 * np.pi)
        assert rel < 1e-8, (mag, rel)


# ---------------------------------------------------------------------------
def test_compare_MT_zero_flow():
    """RemapData::compare_MT (slmmir_remap_data.cpp:418-433): with zero
    flow the advected mesh coincides with the Eulerian mesh, every cell's
    only overlap is itself, and the diagonal T block must equal the
    quadrature mass matrix M: rd(M, T) = ||T_diag - M|| / ||M|| small."""
    from compose_tpu.transport import gallery
    from compose_tpu.transport.ir import IrConfig, IrTransport

    mesh = cubed_sphere.build(4, 4)
    wind = gallery.create_wind("divergent")
    cfg = IrConfig(ne=4, np_=4, method="ir", dmc="none", filter="none",
                   limiter="none", nsub=2)
    model = IrTransport(mesh, wind, cfg)
    ird = model.ird

    adv_vert = ird.vert_xyz                          # zero flow
    adv_cells = adv_vert[ird.cell2vert]
    pair_src, pair_tgt, pair_mask = model._pairs(adv_cells)
    T, _ = model._assemble_T(adv_cells, pair_src, pair_tgt, pair_mask)

    # T blocks live per (tgt, cand) pair; extract each target's self-block.
    # ird.chol is chol(M); recover M = L @ L.T.
    L = ird.chol
    M = jnp.einsum('cik,cjk->cij', L, L)

    ps, pt = np.asarray(pair_src), np.asarray(pair_tgt)
    pm = np.asarray(pair_mask)
    Tn = np.asarray(T)
    num = 0.0
    den = 0.0
    Mn = np.asarray(M)
    for c in range(mesh.ncell):
        sel = np.where(pm & (pt == c) & (ps == c))
        assert len(sel[0]) == 1
        Tb = Tn[sel][0]
        num += float(np.sum((Tb - Mn[c]) ** 2))
        den += float(np.sum(Mn[c] ** 2))
        # Off-diagonal blocks (overlaps with neighbors) must be ~zero.
        offs = np.where(pm & (pt == c) & (ps != c))
        if len(offs[0]):
            assert np.abs(Tn[offs]).max() < 1e-10 * np.abs(Mn[c]).max()
    rd = np.sqrt(num / den)
    # The reference prints rd without a hard threshold (it is a diagnostic).
    # T integrates over the clipped polygon's triangle fan while M uses the
    # fixed (0,1,2)/(0,2,3) split, so they agree only to the quadrature
    # accuracy of the non-polynomial spherical Jacobian (~1e-7 at order 18).
    assert rd < 1e-6, rd

    # Transpose-graph check (slmmir_remapper.cpp:136-151): under zero flow
    # the (tgt, src) pattern is symmetric.
    pairs = set(zip(pt[pm].tolist(), ps[pm].tolist()))
    assert all((s, t) in pairs for (t, s) in pairs)
