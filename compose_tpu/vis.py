"""Visualization / raster output.

Counterpart of /root/reference/methods/slmm/slmm_vis.{hpp,cpp}: map a CGLL
field to a regular lat-lon (or orthographic) raster by point location +
in-cell interpolation, and write binary snapshots. The reference builds a
sparse bilinear operator over the CGLL subcell mesh; here we evaluate the
spectral basis directly at each raster point - one batched locate + Newton
invert + tensor basis eval, reusing the ISL machinery.
"""

import numpy as np
import jax.numpy as jnp

from . import basis as basis_mod
from .mesh import cubed_sphere
from .ops import sphere, sqr


def latlon_grid(nlat: int, nlon: int):
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    lon = np.linspace(-np.pi, np.pi, nlon, endpoint=False)
    LA, LO = np.meshgrid(lat, lon, indexing="ij")
    return LA, LO


def ortho_grid(res: int, center_lat: float = 0.0, center_lon: float = 0.0):
    """Orthographic hemisphere projection grid centered at (lat, lon)
    (the reference's orthographic VisWriter map, slmm_vis.cpp). Returns
    (lat, lon, mask): (res, res) arrays; mask is False outside the disk
    (those samples should be blanked)."""
    X, Y = np.meshgrid(np.linspace(-1, 1, res), np.linspace(-1, 1, res),
                       indexing="xy")
    r2 = X * X + Y * Y
    mask = r2 <= 1.0
    Z = np.sqrt(np.maximum(0.0, 1.0 - r2))
    c = np.asarray([np.cos(center_lat) * np.cos(center_lon),
                    np.cos(center_lat) * np.sin(center_lon),
                    np.sin(center_lat)])
    east = np.asarray([-np.sin(center_lon), np.cos(center_lon), 0.0])
    north = np.cross(c, east)
    p = (X[..., None] * east + Y[..., None] * north + Z[..., None] * c)
    lat = np.arcsin(np.clip(p[..., 2], -1, 1))
    lon = np.arctan2(p[..., 1], p[..., 0])
    return lat, lon, mask


def sample_field(mesh: cubed_sphere.CubedSphereMesh, field_dgll, lat, lon,
                 basis_name: str = None, mask=None):
    """Evaluate a DGLL field (..., ncell, np2) at (lat, lon) arrays.

    Returns (..., *lat.shape). Uses the transport basis for in-cell
    interpolation (vis::BilinGLLToLatLon uses bilinear subcells; spectral
    evaluation is strictly more accurate). `mask` (same shape as lat)
    blanks samples to 0 - e.g. the outside of an orthographic disk."""
    bas = basis_mod.create(basis_name or mesh.basis_name, mesh.np_)
    shape = np.shape(lat)
    p = sphere.ll2xyz(jnp.asarray(np.ravel(lat)), jnp.asarray(np.ravel(lon)))
    ci, a, b = cubed_sphere.locate(mesh, p)
    if not mesh.nonuni:
        a, b = sqr.sphere_to_ref(mesh.corners[ci], p, a0=a, b0=b)
    va = bas.eval(a)                      # (npts, np)
    vb = bas.eval(b)
    w = (vb[:, :, None] * va[:, None, :]).reshape(p.shape[0], mesh.np2)
    src = field_dgll[..., ci, :]          # (..., npts, np2)
    out = jnp.einsum('...px,px->...p', src, w)
    out = np.asarray(out).reshape(out.shape[:-1] + shape)
    if mask is not None:
        out = np.where(mask, out, 0.0)
    return out


def write_raster(path, arrays):
    """Binary raster snapshot (float32 frames), like VisWriter
    (slmm_vis.cpp): header = (nframes, nlat, nlon) int32, then frames."""
    arrays = [np.asarray(a, dtype=np.float32) for a in arrays]
    nlat, nlon = arrays[0].shape
    with open(path, "wb") as f:
        np.array([len(arrays), nlat, nlon], dtype=np.int32).tofile(f)
        for a in arrays:
            a.tofile(f)
