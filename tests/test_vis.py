"""Raster sampling tests (compose_tpu.vis)."""

import os

import numpy as np
import jax.numpy as jnp

from compose_tpu import vis
from compose_tpu.mesh import build
from compose_tpu.ops import sphere


def test_sample_constant_field():
    mesh = build(4, 4)
    f = jnp.full((mesh.ncell, mesh.np2), 0.42)
    LA, LO = vis.latlon_grid(17, 32)
    out = vis.sample_field(mesh, f, LA, LO)
    assert out.shape == (17, 32)
    assert np.abs(out - 0.42).max() < 1e-12


def test_sample_smooth_field_accuracy():
    mesh = build(6, 4)
    p = mesh.cell_nodes_xyz.reshape(-1, 3)
    f = (p[:, 0] * p[:, 2]).reshape(mesh.ncell, mesh.np2)
    LA, LO = vis.latlon_grid(15, 30)
    out = vis.sample_field(mesh, f, LA, LO)
    pr = np.asarray(sphere.ll2xyz(jnp.asarray(LA), jnp.asarray(LO)))
    exact = pr[..., 0] * pr[..., 2]
    assert np.abs(out - exact).max() < 5e-4


def test_write_raster(tmp_path):
    path = os.path.join(tmp_path, "r.bin")
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    vis.write_raster(path, [a, 2 * a])
    with open(path, "rb") as fh:
        hdr = np.fromfile(fh, np.int32, 3)
        frames = np.fromfile(fh, np.float32).reshape(2, 3, 4)
    assert list(hdr) == [2, 3, 4]
    assert np.allclose(frames[1], 2 * a)


def test_ortho_projection():
    """Orthographic hemisphere raster: a smooth field samples exactly on
    the disk, blanked outside."""
    import numpy as np
    from compose_tpu import driver, vis
    from compose_tpu.mesh import cubed_sphere
    mesh = cubed_sphere.build(4, 4)
    q = driver.init_tracers(mesh, ("xyztrig",))[0]
    lat, lon, mask = vis.ortho_grid(33, center_lat=0.4, center_lon=1.0)
    img = vis.sample_field(mesh, q, lat, lon, mask=mask)
    assert img.shape == (33, 33)
    assert np.all(img[~mask] == 0.0)
    # Compare against direct evaluation of the IC on the disk.
    from compose_tpu.transport import gallery
    ref = np.asarray(gallery.initial_condition(
        "xyztrig", lat[mask].ravel(), lon[mask].ravel()))
    assert np.abs(img[mask].ravel() - ref).max() < 5e-3
