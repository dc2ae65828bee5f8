"""Sharded-SpMM scaling benchmark over a device mesh.

Measures edges/s for the all-gather and ring-halo aggregation paths at
1..P shards. On real multi-chip hardware this measures ICI-limited scaling
efficiency (the BASELINE ≥80% target); on a CPU-forced virtual mesh
(``--virtual``) the devices share one machine, so the numbers validate
*methodology and compiled collectives*, not real bandwidth — the driver's
multi-chip dryrun covers compile/execute correctness the same way.

Run: python benchmarks/scaling_bench.py [--virtual] [--n 200000] [--deg 25]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", action="store_true", help="8 virtual CPU devices")
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--deg", type=int, default=20)
    p.add_argument("--f", type=int, default=128)
    args = p.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from textgcn_tpu.graph.normalize import sym_normalize_coo
    from textgcn_tpu.graph.structs import SparseGraph
    from textgcn_tpu.ops.spmm import spmm
    from textgcn_tpu.parallel.halo import partition_rows_halo, spmm_halo
    from textgcn_tpu.parallel.partition import pad_features, partition_rows
    from textgcn_tpu.parallel.sharded import make_mesh, spmm_sharded

    n, e = args.n, args.n * args.deg
    rng = np.random.RandomState(0)
    row = rng.randint(0, n, e)
    col = rng.randint(0, n, e)
    val = rng.rand(e)
    r, c, v = sym_normalize_coo(row, col, val, n)
    g = SparseGraph.from_coo(r, c, v, n, pad_to_multiple=8192)
    x = rng.randn(n, args.f).astype(np.float32)
    n_edges = g.n_edges

    def timeit(fn, *fargs, iters=10):
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*fargs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    dt1 = timeit(lambda a: spmm(g, a), jnp.asarray(x))
    base = n_edges / dt1
    print(json.dumps({"shards": 1, "path": "single", "ms": dt1 * 1e3,
                      "edges_per_s": base, "efficiency": 1.0}))

    n_dev = len(jax.devices())
    for shards in (2, 4, 8):
        if shards > n_dev:
            break
        mesh = make_mesh(shards)
        pg = partition_rows(g, shards)
        hg = partition_rows_halo(g, shards)
        xp = jnp.asarray(pad_features(x, pg.n_pad))
        for path, fn in (
            ("allgather", lambda a: spmm_sharded(pg, a, mesh)),
            ("halo", lambda a: spmm_halo(hg, a, mesh)),
        ):
            dt = timeit(fn, xp)
            eps = n_edges / dt
            print(
                json.dumps(
                    {
                        "shards": shards,
                        "path": path,
                        "ms": dt * 1e3,
                        "edges_per_s": eps,
                        "efficiency": eps / (base * shards),
                    }
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
