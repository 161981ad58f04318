"""Fine-grained TPU timing of the CDR+limiter phase (the 43%-of-step
residual from PROFILE_r03.json). Run on the real chip: python tools/prof_cdr.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import (IslConfig, IslTransport, gallery, spf,
                                   limiter as limiter_mod)
from compose_tpu.ops.reduce import bfb_sum, bfb_sum_cells

ne, np_, nt = 30, 4, 40
mesh = cubed_sphere.build(ne, np_)
wind = gallery.create_wind("divergent")
cfg = IslConfig(ne=ne, np_=np_, filter="caas", limiter="caas", rho_isl=True,
                nsub=8, geom_dtype="f32", interp_dtype="f32")
model = IslTransport(mesh, wind, cfg)
rho = jnp.ones((mesh.ncell, mesh.np2))
ics = ["gaussianhills", "slottedcylinders", "cosinebells", "xyztrig"]
q1 = driver.init_tracers(mesh, ics)
q = jnp.tile(q1, (10, 1, 1))[:nt]
dt = 86400.0 * 12 / 120
F = model.F
m = mesh

# Produce realistic post-transport fields.
dep, ci, w = jax.jit(model._departure_data)(0.0, dt)
f32 = jnp.float32
ri = model._interp(rho.astype(f32), ci, w.astype(f32))
Jdep = model._jacobian_departure(dep)
ratio32 = Jdep.astype(f32) / m.jac_node.astype(f32)
rho_tgt = (ratio32 * ri[model.d2c_map].reshape(m.ncell, m.np2)
           ).astype(jnp.float64)
qi = model._interp(q.astype(f32), ci, w.astype(f32)).astype(jnp.float64)
q_tgt = jnp.moveaxis(jnp.moveaxis(qi, 0, -1)[model.d2c_map], -1, 0).reshape(
    nt, m.ncell, m.np2)
jax.block_until_ready(q_tgt)


def tm(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dtv = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dtv*1e3:7.3f} ms")
    return out


Ff = F.reshape(-1)

# --- rho CDR chain.
def rho_cdr(rho, rho_tgt, F):
    mm = bfb_sum_cells(jnp.stack([F * rho, F * rho_tgt]))
    mass_src, mass_tgt = mm[0], mm[1]
    rho_mass, R_min, R_mass, R_max = spf.record(
        F, rho_tgt, rho_tgt, jnp.zeros_like(rho_tgt),
        jnp.full_like(rho_tgt, 2.0))
    redist = model.mrd.redistribute(rho_mass, R_min, R_mass, R_max,
                                    mass_src - mass_tgt)
    return limiter_mod.limit_density(F, rho_tgt, redist - R_mass)
rho_tgt2 = tm("rho CDR (sums+caas+limit)", jax.jit(rho_cdr), rho, rho_tgt, F)
rho_tgt2 = tm("rho dss", jax.jit(lambda r, F: model._dss(r, F)), rho_tgt2, F)

# --- tracer CDR pieces.
def q_masses(q, rho, Q_tgt, F):
    QQ = bfb_sum_cells(jnp.stack([F[None] * q * rho[None], F[None] * Q_tgt]))
    return QQ[0], QQ[1]
Q_tgt = q_tgt * rho_tgt2[None]
jax.block_until_ready(Q_tgt)
Qms, Qmt = tm("Q mass bfb sums (2x40x86k)", jax.jit(q_masses), q, rho,
              Q_tgt, F)

def bounds(q, ci):
    q_min_cell = jnp.min(q, axis=-1)
    q_max_cell = jnp.max(q, axis=-1)
    node_src_cell = ci[model.d2c_map].reshape(m.ncell, m.np2)
    qmm = jnp.stack([q_min_cell, q_max_cell])
    qmm_n = jnp.moveaxis(
        jnp.moveaxis(qmm, (0, 1), (-2, -1))[node_src_cell], (-2, -1), (0, 1))
    return qmm_n[0], qmm_n[1]
q_min_node, q_max_node = tm("bounds min/max + gather", jax.jit(bounds), q, ci)

def records(F, rho_tgt, Q_tgt, q_min_node, q_max_node):
    rhom = F[None] * rho_tgt[None]
    Qc_min = jnp.sum(rhom * q_min_node, axis=-1)
    Qc_max = jnp.sum(rhom * q_max_node, axis=-1)
    Qc_mass = jnp.sum(F[None] * Q_tgt, axis=-1)
    return Qc_min, Qc_mass, Qc_max
Qc_min, Qc_mass, Qc_max = tm("per-cell records", jax.jit(records), F,
                             rho_tgt2, Q_tgt, q_min_node, q_max_node)

def redist_fn(rho_tgt, Qc_min, Qc_mass, Qc_max, e):
    return model.mrd.redistribute(jnp.sum(F * rho_tgt, axis=-1), Qc_min,
                                  Qc_mass, Qc_max, e)
redist = tm("glbl caas redistribute", jax.jit(redist_fn), rho_tgt2, Qc_min,
            Qc_mass, Qc_max, Qms - Qmt)

delta = redist - Qc_mass
def lim_fn(Q_tgt, q_min_node, q_max_node, delta):
    lim = jax.vmap(lambda Qi, qmin, qmax, di: limiter_mod.limit_tracer(
        F, rho_tgt2, Qi, qmin, qmax, di, limiter="caas"))
    return lim(Q_tgt, q_min_node, q_max_node, delta)
Q_lim = tm("limit_tracer caas", jax.jit(lim_fn), Q_tgt, q_min_node,
           q_max_node, delta)

def qnew_fn(rho_tgt, Q_tgt, q_min_node, q_max_node):
    rho_inv = 1.0 / jnp.where(rho_tgt == 0, 1.0, rho_tgt)
    q_new = jnp.where(rho_tgt[None] == 0, q_min_node, Q_tgt * rho_inv[None])
    return jnp.clip(q_new, q_min_node, q_max_node)
q_new = tm("q_new + clip", jax.jit(qnew_fn), rho_tgt2, Q_lim, q_min_node,
           q_max_node)

_ = tm("dss_q", jax.jit(lambda r, qq: model._dss_q(r, qq)), rho_tgt2, q_new)
_ = tm("FULL step", lambda: model.step(rho, q, 0.0, dt)[1])
