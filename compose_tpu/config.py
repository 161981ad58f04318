"""Global configuration for compose_tpu.

The reference (E3SM-Project/COMPOSE) enforces mass conservation to ~1e-13 and
bounds to a few ulp (see /root/reference/methods/slmm/slmmir.cpp:955-957 and
cedr/cedr_test_randomized.cpp:293-418), which requires float64 arithmetic.
JAX defaults to float32, so x64 must be enabled before any array is created.
Importing this module (which `compose_tpu/__init__.py` does first) takes care
of it.
"""

import os

import jax

# COMPOSE_TPU_X64=0 opts out (e.g. a benchmark fallback on hardware where
# f64 emulation is unavailable); default is on - the numerics require it.
if os.environ.get("COMPOSE_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# If the user pinned JAX_PLATFORMS to a local platform, drop remote PJRT
# plugin factories (tpu/axon tunnels) from jax's registry: jax initializes
# every registered plugin on first backend use, and a wedged tunnel would
# block local CPU runs.
_plats = os.environ.get("JAX_PLATFORMS", "")
if _plats and all(p.strip() in ("cpu",) for p in _plats.split(",")):
    try:
        # The container sitecustomize may have pinned jax_platforms to the
        # tunnel platform at interpreter start; the env var wins here.
        jax.config.update("jax_platforms", _plats)
        from jax._src import xla_bridge as _xb
        for _plat in ("axon", "tpu"):
            _xb._backend_factories.pop(_plat, None)
    except Exception:  # pragma: no cover
        pass

# Persistent compilation cache: XLA compile times dominate small-problem
# startup (especially CPU test runs); cache compiled executables on disk.
import os as _os

_cache_dir = _os.environ.get(
    "COMPOSE_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"))
# Partition the cache by platform: a TPU-tunnel session also caches CPU AOT
# artifacts compiled for the REMOTE host's CPU; loading those locally trips
# machine-feature mismatches.
_cache_dir = _cache_dir + "-" + _os.environ.get("JAX_PLATFORMS", "default")\
    .replace(",", "_")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # pragma: no cover - older jax without these options
    pass
