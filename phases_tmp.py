import jax, jax.numpy as jnp
from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, gallery
ne, np_, nt = 30, 4, 40
mesh = cubed_sphere.build(ne, np_)
wind = gallery.create_wind("divergent")
cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas",
                rho_isl=True, nsub=8, geom_dtype="f32", interp_dtype="f32")
model = IslTransport(mesh, wind, cfg)
rho = jnp.ones((mesh.ncell, mesh.np2))
ics = ["gaussianhills", "slottedcylinders", "cosinebells", "xyztrig"]
q = jnp.tile(driver.init_tracers(mesh, ics), (10, 1, 1))[:nt]
dt = 86400.0 * 12 / 120
t = model.phase_times(rho, q, 0.0, dt, iters=20)
for k, v in t.items():
    print(f"{k:26s} {v*1e3:8.3f} ms")
