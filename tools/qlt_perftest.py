"""QLT phase timers - the analogue of the reference's `cedr_test -pt`
perf test (/root/reference/cedr/cedr_qlt.cpp:19-76: Timer enum {tree,
analyze, qltrun, qltrunl2r, qltrunr2l, waitall, total} driven by
cedr_test.cpp -pt -nc <ncells> -nr <nrepeat>).

Times, for the single-chip QLT and (on a virtual device mesh) the sharded
QLT: tree construction + schedule analysis (setup), the l2r sweep, the
r2l sweep, and the full run. Usage:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/qlt_perftest.py [-nc 5400] [-nt 40] [-nr 20] [-ndev 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-nc", type=int, default=5400)
    ap.add_argument("-nt", type=int, default=40)
    ap.add_argument("-nr", type=int, default=20)
    ap.add_argument("-ndev", type=int, default=0,
                    help="also run the sharded QLT at this device count")
    a = ap.parse_args()

    from compose_tpu.cdr import qlt as qlt_mod, tree as tree_mod

    rng = np.random.default_rng(0)
    nc, nt = a.nc, a.nt
    rhom = jnp.asarray(rng.uniform(0.5, 1.0, nc))
    qmin = rng.uniform(0, .3, (nt, nc))
    qmax = qmin + rng.uniform(.2, .5, (nt, nc))
    r = np.asarray(rhom)
    Qm = jnp.asarray((qmin + (qmax - qmin) * rng.uniform(0, 1, (nt, nc))) * r
                     + 0.2 * rng.standard_normal((nt, nc)) * r)
    Qm_min = jnp.asarray(qmin * r)
    Qm_max = jnp.asarray(qmax * r)

    # --- tree + analyze (setup; the reference's t_tree + t_analyze).
    t0 = time.perf_counter()
    tree_mod.build.__wrapped__(nc) if hasattr(tree_mod.build, "__wrapped__") \
        else tree_mod.build(nc)
    t_tree = time.perf_counter() - t0
    t0 = time.perf_counter()
    solver = qlt_mod.QLT(nc, problem_type=qlt_mod.SHAPEPRESERVE)
    t_analyze = time.perf_counter() - t0

    # --- full run (compile, then time).
    out = solver.run(rhom, Qm, Qm_min, Qm_max)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(a.nr):
        out = solver.run(rhom, Qm, Qm_min, Qm_max)
    jax.block_until_ready(out)
    t_run = (time.perf_counter() - t0) / a.nr

    # --- l2r-only probe: the combine sweep alone (the r2l share is the
    # residual; the reference times them separately around MPI waits).
    def l2r_only(rhom, Qm, Qm_min, Qm_max):
        t = solver.tree
        nn = t.nnodes
        V = jnp.zeros((nt, nn), Qm.dtype).at[:, :t.nleaf].set(Qm)
        for ids, k0, k1 in t.levels:
            v0 = V[..., k0]
            v1 = jnp.where(k1 < 0, jnp.zeros_like(v0),
                           V[..., jnp.maximum(k1, 0)])
            V = V.at[:, ids].set(v0 + v1)
        return V

    f = jax.jit(l2r_only)
    o = f(rhom, Qm, Qm_min, Qm_max)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(a.nr):
        o = f(rhom, Qm, Qm_min, Qm_max)
    jax.block_until_ready(o)
    t_l2r = (time.perf_counter() - t0) / a.nr

    print(f"QLT perftest nc={nc} nt={nt} nr={a.nr} "
          f"platform={jax.default_backend()}")
    print(f"  tree     {t_tree*1e3:9.3f} ms (one-time)")
    print(f"  analyze  {t_analyze*1e3:9.3f} ms (one-time)")
    print(f"  qltrun   {t_run*1e3:9.3f} ms/rep")
    print(f"  ~l2r     {t_l2r*1e3:9.3f} ms/rep (combine sweep alone)")
    print(f"  ~r2l     {(t_run-t_l2r)*1e3:9.3f} ms/rep (residual: node QPs)")

    if a.ndev and len(jax.devices()) >= a.ndev:
        from jax.sharding import Mesh, PartitionSpec as P
        from compose_tpu.cdr.qlt_sharded import ShardedQLT
        t0 = time.perf_counter()
        sq = ShardedQLT(nc, a.ndev)
        t_an2 = time.perf_counter() - t0
        mesh = Mesh(np.array(jax.devices()[:a.ndev]), ("cells",))
        fs = jax.jit(jax.shard_map(
            lambda rr, q, qn, qx: sq.run(rr, q, qn, qx), mesh=mesh,
            in_specs=(P("cells"), P(None, "cells"), P(None, "cells"),
                      P(None, "cells")),
            out_specs=P(None, "cells"), check_vma=False))
        o = fs(rhom, Qm, Qm_min, Qm_max)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(a.nr):
            o = fs(rhom, Qm, Qm_min, Qm_max)
        jax.block_until_ready(o)
        t_sh = (time.perf_counter() - t0) / a.nr
        print(f"  sharded analyze ({a.ndev} dev) {t_an2*1e3:9.3f} ms")
        print(f"  sharded qltrun  ({a.ndev} dev) {t_sh*1e3:9.3f} ms/rep "
              f"(frontier gather = {sq.n_shards * sq.max_nf} scalars/ch)")


if __name__ == "__main__":
    main()
