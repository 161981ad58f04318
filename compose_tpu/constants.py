"""Physical constants used by the wind-field gallery.

Mirrors the constants the reference uses (see
/root/reference/methods/slmm/slmm_util.hpp: consts::earth_radius_m and the
day2sec/m2radlat helpers).
"""

earth_radius_m = 6.37122e6


def day2sec(d):
    return d * 86400.0


def sec2day(s):
    return s / 86400.0
