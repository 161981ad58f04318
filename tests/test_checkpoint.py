"""Checkpoint/resume round trip, including bitwise-identical continuation of
a transport run."""

import os

import numpy as np
import jax.numpy as jnp

from compose_tpu import checkpoint, driver
from compose_tpu.mesh import build
from compose_tpu.transport import IslConfig, IslTransport, gallery


def test_checkpoint_roundtrip(tmp_path):
    mesh = build(3, 4)
    rho = jnp.ones((mesh.ncell, mesh.np2))
    q = driver.init_tracers(mesh, ("gaussianhills",))
    path = os.path.join(tmp_path, "ck")
    checkpoint.save(path, 3, 123.0, rho, q, meta={"ne": 3})
    step, t, rho2, q2, meta = checkpoint.restore(path)
    assert (step, t) == (3, 123.0)
    assert meta["ne"] == 3
    assert np.array_equal(np.asarray(rho), np.asarray(rho2))
    assert np.array_equal(np.asarray(q), np.asarray(q2))


def test_resume_bitwise(tmp_path):
    mesh = build(3, 4)
    wind = gallery.create_wind("divergent")
    cfg = IslConfig(ne=3, np_=4, filter="caas", limiter="caas", nsub=2)
    model = IslTransport(mesh, wind, cfg)
    rho = jnp.ones((mesh.ncell, mesh.np2))
    q = driver.init_tracers(mesh, ("cosinebells",))
    dt = 86400.0
    # Two straight steps.
    r1, q1 = model.step(rho, q, 0.0, dt)
    r2, q2 = model.step(r1, q1, dt, 2 * dt)
    # Step, checkpoint, restore, step.
    path = os.path.join(tmp_path, "ck")
    checkpoint.save(path, 1, dt, r1, q1)
    _, t, rr, qq, _ = checkpoint.restore(path)
    r2b, q2b = model.step(rr, qq, t, 2 * dt)
    assert np.array_equal(np.asarray(r2), np.asarray(r2b))
    assert np.array_equal(np.asarray(q2), np.asarray(q2b))
