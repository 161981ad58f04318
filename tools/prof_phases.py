import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, gallery
mesh = cubed_sphere.build(30, 4)
wind = gallery.create_wind("divergent")
model = IslTransport(mesh, wind, IslConfig(ne=30, np_=4, filter="caas",
    limiter="caas", geom_dtype="f32", interp_dtype="f32"))
rho = jnp.ones((mesh.ncell, mesh.np2))
q1 = driver.init_tracers(mesh, ["gaussianhills", "slottedcylinders",
                                "cosinebells", "xyztrig"])
q = jnp.tile(q1, (10, 1, 1))[:40]
dt = 86400.0 * 12 / 120
for k, v in model.phase_times(rho, q, 0.0, dt).items():
    print(f"{k:28s} {v*1e3:7.3f} ms")
