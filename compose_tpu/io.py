"""NetCDF output of nodal fields.

Counterpart of /root/reference/methods/slmm/slmm_io.{hpp,cpp}
(io::NetcdfWriter): continuous-node coordinates + per-step nodal fields in a
self-describing NetCDF file. Uses scipy's NetCDF3 writer (no external
netCDF4 dependency); gated so environments without scipy still import.
"""

import numpy as np

try:
    from scipy.io import netcdf_file
    HAVE_NETCDF = True
except Exception:  # pragma: no cover
    HAVE_NETCDF = False

from .ops import sphere
from .transport import dss as dss_mod


class NetcdfWriter:
    """Writes CGLL nodal fields per time step (slmm_io.cpp semantics:
    add_nodal_field during definition, advance_time_to + write_field during
    the run)."""

    def __init__(self, mesh, path):
        if not HAVE_NETCDF:
            raise RuntimeError("scipy NetCDF writer unavailable")
        self.mesh = mesh
        self.f = netcdf_file(path, "w")
        # scipy's NetCDF3 writer requires the unlimited dimension first.
        self.f.createDimension("time", None)
        self.f.createDimension("node", mesh.cnn)
        lat, lon = sphere.xyz2ll(mesh.cgll_xyz)
        for name, data in (("lat", lat), ("lon", lon)):
            v = self.f.createVariable(name, "d", ("node",))
            v[:] = np.asarray(data)
        self.tvar = self.f.createVariable("time", "d", ("time",))
        self.vars = {}
        self.nt = 0
        self._defined = False

    def add_nodal_field(self, name):
        assert not self._defined
        self.vars[name] = self.f.createVariable(name, "d", ("time", "node"))

    def end_definition(self):
        self._defined = True

    def advance_time_to(self, t):
        self.tvar[self.nt] = t
        self.nt += 1

    def write_field(self, name, dgll_data, dgbfi):
        """dgll_data: (ncell, np2); averaged to continuous nodes."""
        m = self.mesh
        cg = dss_mod.d2c(dgll_data.reshape(-1), m.dgll2cgll.reshape(-1),
                         dgbfi.reshape(-1), m.cnn)
        self.vars[name][self.nt - 1, :] = np.asarray(cg)

    def close(self):
        self.f.close()
