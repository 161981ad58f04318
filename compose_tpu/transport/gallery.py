"""Analytic wind fields and initial conditions (Lauritzen et al. GMD 2012
suite plus extras).

Counterpart of /root/reference/methods/slmm/slmm_gallery.{hpp,cpp}. All wind
fields are implemented in their xyz (cartesian) form: given positions
(..., 3) and time, return cartesian velocities (..., 3). The xyz form is
branch-free (no pole singularities) and is what the reference uses for its
own xyz mode (slmm_gallery.cpp:274-298, uv2xyz). ICs take (lat, lon) arrays.
"""

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..ops import sphere


def _uv2xyz(p, u, v):
    """Tangent (u along-latitude, v along-longitude->north) velocity to
    cartesian, plus a radial component pushing |p| back to 1
    (slmm_gallery.cpp:274-298)."""
    X, Y, Z = p[..., 0], p[..., 1], p[..., 2]
    r = jnp.sqrt(X * X + Y * Y + Z * Z)
    w = (1.0 - r) / constants.earth_radius_m
    # Local vertical = position direction.
    e_r = p / r[..., None]
    # Along-latitude (east) vector. At the exact poles the east/north frame
    # is singular; use the lon=0 frame there (consistent with
    # xyz2ll's atan2(0,0)=0, so u,v evaluated at lon=0 give the correct
    # limiting cartesian vector for smooth fields).
    den = jnp.sqrt(X * X + Y * Y)
    polar = den < jnp.finfo(den.dtype).tiny
    den_s = jnp.where(polar, 1.0, den)
    e_e = jnp.stack([jnp.where(polar, 0.0, -Y / den_s),
                     jnp.where(polar, 1.0, X / den_s),
                     jnp.zeros_like(Z)], axis=-1)
    # North = vertical x east.
    e_n = sphere.cross(e_r, e_e)
    return (u[..., None] * e_e + v[..., None] * e_n + w[..., None] * e_r)


class WindField:
    """Base: evaluate cartesian velocity (normalized so that integrating
    dp/dt = v(p, t) with p on the unit sphere advects correctly)."""

    def velocity(self, t, p):
        raise NotImplementedError


def _trig_frame(t, p, T):
    """Per-point trig of the deformational flows, computed ALGEBRAICALLY
    from cartesian coordinates: sin/cos of lat come from (z, sqrt(x^2+y^2)),
    sin/cos of the shifted longitude lam' = lon - 2*pi*t/T from the angle
    subtraction identity with the (scalar) shift trig. This removes every
    per-point transcendental (atan2/asin/sin/cos) from the trajectory
    integration hot loop - the velocity formulas are algebraic in these."""
    X, Y, Z = p[..., 0], p[..., 1], p[..., 2]
    r = jnp.sqrt(X * X + Y * Y + Z * Z)
    d = jnp.sqrt(X * X + Y * Y)
    sinth = Z / r
    costh = d / r
    # Pole guard consistent with xyz2ll's atan2(0, 0) = 0 (lon = 0 frame).
    polar = d < jnp.finfo(d.dtype).tiny
    d_s = jnp.where(polar, 1.0, d)
    coslam = jnp.where(polar, 1.0, X / d_s)
    sinlam = jnp.where(polar, 0.0, Y / d_s)
    c = 2 * jnp.pi * t / T
    cc, sc = jnp.cos(c), jnp.sin(c)         # scalars
    sinlp = sinlam * cc - coslam * sc       # sin(lon - c)
    coslp = coslam * cc + sinlam * sc       # cos(lon - c)
    cost = jnp.cos(jnp.pi * t / T)          # scalar
    return sinth, costh, sinlp, coslp, cost


class NonDivergentWindField(WindField):
    """Lauritzen et al. nondivergent deformational flow
    (slmm_gallery.cpp:332-359):
        u = 10 R/T sin^2(lam') sin(2 th) cos(pi t/T) + 2 pi R/T cos(th)
        v = 10 R/T sin(2 lam') cos(th) cos(pi t/T)
    evaluated via sin(2x) = 2 sin x cos x etc. (see _trig_frame)."""

    T = constants.day2sec(12)

    def velocity(self, t, p):
        T = self.T
        sinth, costh, sinlp, coslp, cost = _trig_frame(t, p, T)
        sin2lat = 2 * sinth * costh
        v = 10 / T * (2 * sinlp * coslp) * costh * cost
        u = 1 / T * (10 * sinlp * sinlp * sin2lat * cost
                     + 2 * jnp.pi * costh)
        return _uv2xyz(p, u, v)


class DivergentWindField(WindField):
    """Divergent deformational flow (slmm_gallery.cpp:361-388):
        u = -5 R/T sin^2(lam'/2) sin(2 th) cos^2(th) cos(pi t/T)
            + 2 pi R/T cos(th)
        v = 2.5 R/T sin(lam') cos^3(th) cos(pi t/T)
    with sin^2(lam'/2) = (1 - cos lam')/2 (see _trig_frame)."""

    T = constants.day2sec(12)

    def velocity(self, t, p):
        T = self.T
        sinth, costh, sinlp, coslp, cost = _trig_frame(t, p, T)
        costh2 = costh * costh
        sin2lat = 2 * sinth * costh
        v = 2.5 / T * sinlp * costh2 * costh * cost
        u = 1 / T * (-5 * (0.5 * (1 - coslp)) * sin2lat
                     * costh2 * cost + 2 * jnp.pi * costh)
        return _uv2xyz(p, u, v)


class NonDivergentWindFieldHack(WindField):
    """Nondivergent flow without solid-body translation
    (slmm_gallery.cpp:466-492)."""

    T = constants.day2sec(12)

    def velocity(self, t, p):
        lat, lon = sphere.xyz2ll(p)
        R = constants.earth_radius_m
        T = self.T
        costh = jnp.cos(lat)
        cost = jnp.cos(jnp.pi * t / T)
        v = 10 * R / T * jnp.sin(2 * lon) * costh * cost
        u = 10 * R / T * jnp.sin(lon) ** 2 * jnp.sin(2 * lat) * cost
        return _uv2xyz(p, u / R, v / R)


class Rotate(WindField):
    """Solid-body rotation about an axis; period 12 days. The reference's
    'rotate' ODE (slmm_gallery.hpp). Axis matches its default (x-ish tilted)
    configuration; we use the standard test's north-pole axis unless given."""

    def __init__(self, axis=(0.2, 0.7, 1.0)):
        a = np.asarray(axis, dtype=np.float64)
        self.axis = jnp.asarray(a / np.linalg.norm(a))
        self.omega = 2 * jnp.pi / constants.day2sec(12)

    def velocity(self, t, p):
        return self.omega * sphere.cross(
            jnp.broadcast_to(self.axis, p.shape), p)


class MovingVortices(WindField):
    """Nair-Jablonowski moving vortices (slmm_gallery.cpp:390-464)."""

    rho0 = 3.0
    gamma = 5.0

    @staticmethod
    def Omega():
        return 2 * np.pi / constants.day2sec(12)

    @classmethod
    def calc_rho(cls, theta, lam):
        return cls.rho0 * jnp.sqrt(
            1 - (jnp.cos(theta) * jnp.sin(lam)) ** 2)

    @classmethod
    def calc_omega(cls, Omega, rho):
        R = constants.earth_radius_m
        safe = rho != 0
        rho_s = jnp.where(safe, rho, 1.0)
        om = (Omega * R * 1.5 * jnp.sqrt(3.0) * jnp.tanh(rho_s)
              / (rho_s * jnp.cosh(rho_s) ** 2))
        return jnp.where(safe, om, 0.0)

    def velocity(self, t, p):
        lat, lon = sphere.xyz2ll(p)
        R = constants.earth_radius_m
        Omega = self.Omega()
        lam_p = lon - Omega * t
        costh = jnp.cos(lat)
        rho = self.calc_rho(lat, lam_p)
        omega = self.calc_omega(Omega, rho)
        v = omega * jnp.cos(lam_p)
        u = omega * jnp.sin(lam_p) * jnp.sin(lat) + R * Omega * costh
        return _uv2xyz(p, u / R, v / R)

    @classmethod
    def calc_tracer(cls, time, lat, lon):
        """Analytic tracer field (slmm_gallery.cpp:418-431)."""
        R = constants.earth_radius_m
        Omega = cls.Omega()
        lon_d = lon - Omega * time
        lam_p = jnp.arctan2(-jnp.cos(lon_d), jnp.tan(lat))
        rho = cls.calc_rho(lat, lon_d)
        omega = cls.calc_omega(Omega, rho)
        return 1 - jnp.tanh(
            (rho / cls.gamma) * jnp.sin(lam_p - (omega / R) * time))


class Dcmip1d3ll(WindField):
    """DCMIP 1-3 background flow: solid-body rotation about an axis tilted
    alpha = pi/6 from the pole, period tau = 1036800 s
    (slmm_gallery.cpp:300-330; the lat-lon form's pole singularity
    disappears in this exact cartesian formulation)."""

    def __init__(self):
        alpha = np.pi / 6
        self.axis = jnp.asarray([-np.sin(alpha), 0.0, np.cos(alpha)])
        self.omega = 2 * np.pi / 1036800.0

    def velocity(self, t, p):
        return self.omega * sphere.cross(
            jnp.broadcast_to(self.axis, p.shape), p)


class TestWindField(WindField):
    """Nondivergent deformational flow plus a vertical-structure
    perturbation term ud (slmm_gallery.cpp:494-543), at the fixed level
    z = 0.05*ztop."""

    T = constants.day2sec(12)

    def velocity(self, t, p):
        lat, lon = sphere.xyz2ll(p)
        R = constants.earth_radius_m
        T = self.T
        ztop = 12000.0
        z = 0.05 * ztop
        T0, Rd, g, p0 = 300.0, 287.04, 9.80616, 100000.0
        H = Rd * T0 / g
        omega0 = (2 * 23000 * np.pi) / T
        lam_p = lon - 2 * jnp.pi * t / T
        costh = jnp.cos(lat)
        cost = jnp.cos(jnp.pi * t / T)
        pr = p0 * np.exp(-z / H)
        ptop = p0 * np.exp(-ztop / H)
        bs = 0.2
        s_p = (-np.exp((pr - p0) / (bs * ptop))
               + np.exp((ptop - pr) / (bs * ptop))) / (bs * ptop)
        ud = (omega0 * R) * jnp.cos(lam_p) * costh ** 2 * cost * s_p
        v = 10 * R / T * jnp.sin(2 * lam_p) * costh * cost
        u = (R / T * (10 * jnp.sin(lam_p) ** 2 * jnp.sin(2 * lat) * cost
                      + 2 * jnp.pi * costh) + ud)
        return _uv2xyz(p, u / R, v / R)


WINDS = {
    "nondivergent": NonDivergentWindField,
    "divergent": DivergentWindField,
    "nondivergenthack": NonDivergentWindFieldHack,
    "rotate": Rotate,
    "movingvortices": MovingVortices,
    "dcmip1d3ll": Dcmip1d3ll,
    "testfn": TestWindField,
}


def create_wind(name: str) -> WindField:
    return WINDS[name.lower()]()


# ----------------------------------------------------------------------------
# Initial conditions (slmm_gallery.cpp:62-238). All take (lat, lon) arrays.

_lon1, _lat1 = 5 * np.pi / 6, 0.0
_lon2, _lat2 = -5 * np.pi / 6, 0.0


def _gh(x, y, z, xi, yi, zi):
    h_max, b = 0.95, 5.0
    r2 = (x - xi) ** 2 + (y - yi) ** 2 + (z - zi) ** 2
    return h_max * jnp.exp(-b * r2)


def _cb(r_i, r):
    return 0.5 * (1 + jnp.cos(jnp.pi * r_i / r))


def xyztrig(lat, lon):
    p = sphere.ll2xyz(lat, lon)
    return 0.5 * (1 + jnp.sin(3 * p[..., 0]) * jnp.sin(3 * p[..., 1])
                  * jnp.sin(4 * p[..., 2]))


def gaussianhills(lat, lon):
    p = sphere.ll2xyz(lat, lon)
    c1 = sphere.ll2xyz(_lat1, _lon1)
    c2 = sphere.ll2xyz(_lat2, _lon2)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return (_gh(x, y, z, c1[0], c1[1], c1[2])
            + _gh(x, y, z, c2[0], c2[1], c2[2]))


def cosinebells(lat, lon):
    r, b, c = 0.5, 0.1, 0.9
    r1 = sphere.great_circle_dist(lat, lon, _lat1, _lon1)
    r2 = sphere.great_circle_dist(lat, lon, _lat2, _lon2)
    h = jnp.where(r1 < r, _cb(r1, r), jnp.where(r2 < r, _cb(r2, r), 0.0))
    return b + c * h


def correlatedcosinebells(lat, lon):
    a, b = -0.8, 0.9
    return a * cosinebells(lat, lon) ** 2 + b


def slottedcylinders(lat, lon):
    b, c = 0.1, 1.0
    R = 1.0
    r = 0.5 * R
    lon_thr = r / (6 * R)
    lat_thr = 5 * (r / (12 * R))
    r1 = sphere.great_circle_dist(lat, lon, _lat1, _lon1)
    r2 = sphere.great_circle_dist(lat, lon, _lat2, _lon2)
    in1 = (r1 <= r) & ((jnp.abs(lon - _lon1) >= lon_thr)
                       | ((jnp.abs(lon - _lon1) < lon_thr)
                          & (lat - _lat1 < -lat_thr)))
    in2 = (r2 <= r) & ((jnp.abs(lon - _lon2) >= lon_thr)
                       | ((jnp.abs(lon - _lon2) < lon_thr)
                          & (lat - _lat2 > lat_thr)))
    return jnp.where(in1 | in2, c, b)


def constant(lat, lon):
    return jnp.full(jnp.shape(lat), 0.42)


def zero(lat, lon):
    return jnp.zeros(jnp.shape(lat))


def vortextracer(lat, lon):
    return MovingVortices.calc_tracer(0.0, lat, lon)


def equatorstep(lat, lon):
    return jnp.where(lat >= 0, 1.0, 0.1)


def equatorsmoothstep(lat, lon):
    lat_thr, a, b = np.pi / 4, 0.1, 1.0
    smooth = a + ((b - a) / 2) * (1 + jnp.sin(np.pi / 2 * (lat / lat_thr)))
    return jnp.where(jnp.abs(lat) >= lat_thr,
                     jnp.where(lat >= 0, b, a), smooth)


def slotcyltrig(lat, lon):
    sc = slottedcylinders(lat, lon)
    trig = xyztrig(lat, lon)
    return jnp.where(sc > 0.9, sc, trig)


def smoothbelts(lat, lon):
    # Rotation of x-axis by 0.1*pi (slmm_gallery.cpp:193-208).
    angle = 0.1 * np.pi
    ca, sa = np.cos(angle), np.sin(angle)
    p = sphere.ll2xyz(lat, lon)
    # Row 3 of the rotation matrix about the x axis.
    y2 = sa * p[..., 1] + ca * p[..., 2]
    return 0.5 * (1 + jnp.cos(jnp.pi * y2))


def cbandsc(lat, lon):
    out = jnp.full(jnp.shape(lat), 0.1)
    lon1 = 3 * np.pi / 6
    r, c = 0.5, 0.9
    r1 = sphere.great_circle_dist(lat, lon, _lat1, lon1)
    out = out + jnp.where(r1 < r, c * _cb(r1, r), 0.0)
    R = 1.0
    rr = 0.5 * R
    lon_thr = rr / (6 * R)
    lat_thr = 5 * (rr / (12 * R))
    r2 = sphere.great_circle_dist(lat, lon, _lat2, _lon2)
    in2 = (r2 <= rr) & ((jnp.abs(lon - _lon2) >= lon_thr)
                        | ((jnp.abs(lon - _lon2) < lon_thr)
                           & (lat - _lat2 > lat_thr)))
    return jnp.where(in2, c, out)


# Toy chemistry (terminator test; slmm_gallery.cpp:240-268).
_K1_LAT_CENTER = np.pi * 20.0 / 180.0
_K1_LON_CENTER = np.pi * 300.0 / 180.0
_TOYCHEM_CONSTANT = 4e-6


def _k_vals(lat, lon):
    k1 = jnp.maximum(
        0.0, jnp.sin(lat) * jnp.sin(_K1_LAT_CENTER)
        + jnp.cos(lat) * jnp.cos(_K1_LAT_CENTER)
        * jnp.cos(lon - _K1_LON_CENTER))
    return k1, jnp.ones_like(lat)


def toychem1(lat, lon):
    k1, k2 = _k_vals(lat, lon)
    r = k1 / (4 * k2)
    det = jnp.sqrt(r * r + 2 * _TOYCHEM_CONSTANT * r)
    return det - r


def toychem2(lat, lon):
    return _TOYCHEM_CONSTANT - toychem1(lat, lon)


def toychem_tendency(lat, lon, cl, cl2, dt):
    """Terminator chemistry tendencies (slmm_gallery.cpp:247-268)."""
    cl2 = 0.5 * cl2
    k1, k2 = _k_vals(lat, lon)
    r = k1 / (4 * k2)
    cly = cl + 2 * cl2
    det = jnp.sqrt(r * r + 2 * r * cly)
    expdt = jnp.exp(-4 * k2 * det * dt)
    el = jnp.where(jnp.abs(det * k2 * dt) > 1e-16,
                   (1 - expdt) / jnp.where(det * dt != 0, det * dt, 1.0),
                   4 * k2)
    cl_f = (-el * (cl - det + r) * (cl + det + r)
            / (1 + expdt + dt * el * (cl + r)))
    return cl_f, -cl_f


ICS = {
    "xyztrig": xyztrig,
    "gaussianhills": gaussianhills,
    "cosinebells": cosinebells,
    "correlatedcosinebells": correlatedcosinebells,
    "slottedcylinders": slottedcylinders,
    "constant": constant,
    "zero": zero,
    "vortextracer": vortextracer,
    "equatorstep": equatorstep,
    "equatorsmoothstep": equatorsmoothstep,
    "slotcyltrig": slotcyltrig,
    "smoothbelts": smoothbelts,
    "cbandsc": cbandsc,
    "toychem1": toychem1,
    "toychem2": toychem2,
}


def initial_condition(name: str, lat, lon):
    return ICS[name.lower()](lat, lon)
