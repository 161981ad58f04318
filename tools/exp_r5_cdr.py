"""Round-5: CDR-region breakdown + ENTRY-op shape histogram."""
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from compose_tpu import driver
from compose_tpu.mesh import cubed_sphere
from compose_tpu.transport import IslConfig, IslTransport, gallery


def tm_step(model, rho, q, dt, iters=20):
    out = model.step(rho, q, 0.0, dt)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = model.step(rho, q, i * dt, (i + 1) * dt)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def entry_hist(model, rho, q, dt):
    tables = (model.F, model.mesh.jac_node)
    txt = jax.jit(model._step_impl).lower(
        rho, q, 0.0, dt, mesh_tables=tables).compile().as_text()
    m = re.search(r"ENTRY [^{]*\{(.*?)\n\}", txt, re.S)
    body = m.group(1)
    hist = {}
    for ln in body.splitlines():
        mm = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\S+) (\w+)\(", ln)
        if not mm:
            continue
        shape, op = mm.groups()
        key = (op, shape)
        hist[key] = hist.get(key, 0) + 1
    return hist


def main():
    ne, np_, nt = 30, 4, 40
    mesh = cubed_sphere.build(ne, np_)
    wind = gallery.create_wind("divergent")
    dt = 86400.0 * 12 / 120
    rho = jnp.ones((mesh.ncell, mesh.np2), jnp.float64)
    q1 = driver.init_tracers(mesh, ["gaussianhills", "slottedcylinders",
                                    "cosinebells", "xyztrig"]).astype(
        jnp.float64)
    q = jnp.tile(q1, (10, 1, 1))[:nt]

    def build(**kw):
        base_kw = dict(filter="caas", limiter="caas", rho_isl=True, nsub=8,
                       geom_dtype="f32", interp_dtype="f32")
        base_kw.update(kw)
        return IslTransport(mesh, wind, IslConfig(ne=ne, np_=np_, **base_kw))

    base = build()
    hist = entry_hist(base, rho, q, dt)
    # Aggregate non-fusion/bitcast/reshape/constant ops by op kind.
    skip = {"parameter", "constant", "bitcast", "reshape", "tuple",
            "get-tuple-element"}
    agg = {}
    for (op, shape), c in hist.items():
        if op in skip:
            continue
        agg[op] = agg.get(op, 0) + c
    print("ENTRY op kinds:", sorted(agg.items(), key=lambda x: -x[1]))
    big = sorted(((c, op, shape) for (op, shape), c in hist.items()
                  if op not in skip), reverse=True)[:25]
    print("top (count, op, shape):")
    for c, op, shape in big:
        print(f"  {c:4d} {op:12s} {shape}")

    print(f"baseline:            {tm_step(base, rho, q, dt)*1e3:.3f} ms")
    print(f"limiter none:        {tm_step(build(limiter='none'), rho, q, dt)*1e3:.3f} ms")
    print(f"filter mn2:          {tm_step(build(filter='mn2'), rho, q, dt)*1e3:.3f} ms")
    print(f"filter caas-node:    {tm_step(build(filter='caas-node'), rho, q, dt)*1e3:.3f} ms")
    print(f"filter qlt:          {tm_step(build(filter='qlt'), rho, q, dt)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
