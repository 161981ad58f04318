"""NetCDF writer round-trip test."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from compose_tpu import io as cio
from compose_tpu.mesh import build


@pytest.mark.skipif(not cio.HAVE_NETCDF, reason="no scipy netcdf")
def test_netcdf_roundtrip(tmp_path):
    mesh = build(3, 4)
    path = os.path.join(tmp_path, "out.nc")
    w = cio.NetcdfWriter(mesh, path)
    w.add_nodal_field("q")
    w.end_definition()
    f = jnp.full((mesh.ncell, mesh.np2), 0.42)
    w.advance_time_to(0.0)
    w.write_field("q", f, mesh.dgbfi_gll)
    w.advance_time_to(1.0)
    w.write_field("q", 2 * f, mesh.dgbfi_gll)
    w.close()

    from scipy.io import netcdf_file
    r = netcdf_file(path, "r")
    q = np.array(r.variables["q"][:])
    assert q.shape == (2, mesh.cnn)
    assert np.allclose(q[0], 0.42) and np.allclose(q[1], 0.84)
    assert np.array(r.variables["time"][:]).tolist() == [0.0, 1.0]
    r.close()
