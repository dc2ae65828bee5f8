"""SpMM throughput benchmark: segment-sum vs Pallas BSR vs dense.

Publishes the numbers the reference never measured (BASELINE.md: "SpMM
throughput — not measured by reference"): edges/s, effective GFLOP/s, and
fraction of the HBM-bandwidth roofline.

Roofline model: full-batch GCN SpMM is bandwidth-bound. The minimum HBM
traffic for Â@X on a graph with E edges and F-dim features is roughly
  read  E*(idx+val)  +  gather E*F*4 (worst case, no reuse)
  write N*F*4
The BSR kernel's traffic is blocks (nnzb*bm*bn*dtype) + gathered X tiles +
output. We report measured edges/s and the bandwidth-equivalent utilization.

Run: PYTHONPATH=. python benchmarks/spmm_bench.py [--large]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Callable, Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BW_BYTES = 819e9  # TPU v5e HBM bandwidth (public spec)


def _time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    import jax.numpy as jnp

    for _ in range(warmup):
        out = fn(*args)
    # force a scalar readback: through the axon tunnel block_until_ready does
    # not block on device execution, so drain the queue with a reduction
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def synthetic_powerlaw_graph(
    n: int, avg_degree: int, seed: int = 0, sorted_rows: bool = True
):
    """Power-law-ish degree graph: preferential dst sampling."""
    rng = np.random.RandomState(seed)
    e = n * avg_degree
    row = rng.randint(0, n, e)
    # skewed cols: mix uniform with zipf-clipped hubs
    hubs = np.minimum(rng.zipf(1.5, e) - 1, n - 1)
    uni = rng.randint(0, n, e)
    col = np.where(rng.rand(e) < 0.3, hubs, uni)
    val = rng.rand(e).astype(np.float32)
    return row, col, val


def bench_graph(
    row, col, val, n: int, f: int = 200, label: str = "", methods=("segment", "bsr")
) -> Dict[str, Dict[str, float]]:
    import jax.numpy as jnp

    from textgcn_tpu.graph.structs import BlockSparseGraph, SparseGraph
    from textgcn_tpu.ops.pallas_spmm import spmm_bsr
    from textgcn_tpu.ops.spmm import spmm

    e = len(row)
    x = np.random.RandomState(1).randn(n, f).astype(np.float32)
    xj = jnp.asarray(x)
    out: Dict[str, Dict[str, float]] = {}

    if "segment" in methods:
        g = SparseGraph.from_coo(row, col, val, n, pad_to_multiple=8192)
        dt = _time_fn(lambda a: spmm(g, a), xj)
        # minimal-traffic model for gather-scatter
        bytes_moved = e * (4 + 4 + 4) + e * f * 4 + n * f * 4
        out["segment"] = {
            "ms": dt * 1e3,
            "edges_per_s": e / dt,
            "gflops": 2 * e * f / dt / 1e9,
            "roofline_frac": bytes_moved / dt / HBM_BW_BYTES,
        }
    if "bsr" in methods:
        bg = BlockSparseGraph.from_coo(row, col, val, n, bm=128, bn=128)
        nnzb = bg.blocks.shape[0]
        for tag, use_bf16 in (("bsr", False), ("bsr_bf16", True)):
            dt = _time_fn(lambda a: spmm_bsr(bg, a, bf16=use_bf16), xj)
            isz = 2 if use_bf16 else 4
            bytes_moved = (
                nnzb * bg.bm * bg.bn * isz
                + nnzb * bg.bn * f * isz
                + n * f * 4
            )
            out[tag] = {
                "ms": dt * 1e3,
                "edges_per_s": e / dt,
                "gflops": 2 * e * f / dt / 1e9,
                "mxu_gflops": 2 * nnzb * bg.bm * bg.bn * f / dt / 1e9,
                "nnzb": nnzb,
                "block_occupancy": e / (nnzb * bg.bm * bg.bn),
                "roofline_frac": bytes_moved / dt / HBM_BW_BYTES,
            }
    if "onehot" in methods:
        from textgcn_tpu.ops.pallas_onehot import OneHotGraph, spmm_onehot

        t0 = time.perf_counter()
        og = OneHotGraph.from_coo(row, col, val, n, f_hint=f)
        plan_s = time.perf_counter() - t0
        import jax

        pln = og.fwd
        e_pad = pln.n_sc * pln.c_sc * pln.k
        f_pad = ((f + 127) // 128) * 128
        # spmm_onehot is jitted at definition with the plans as ARGUMENTS —
        # do not wrap in another jit(lambda): closing over the plan bakes
        # the edge arrays into the HLO as constants (GBs of compile payload)
        dt = _time_fn(lambda a: spmm_onehot(og.fwd, og.bwd, a), xj)
        # gather floor: the unavoidable random read of X rows (measured, the
        # honest speed-of-light for uniform sparsity on this chip)
        gt = _time_fn(jax.jit(lambda a: a[pln.col[0]]), xj, iters=5)
        # traffic: gather read E*F*4 + p write/read E'*Fp*2 each + idx/val + Y
        bytes_moved = (
            e * f * 4 + 2 * e_pad * f_pad * 2 + e_pad * 8 + n * f * 4
        )
        out["onehot"] = {
            "ms": dt * 1e3,
            "edges_per_s": e / dt,
            "gflops": 2 * e * f / dt / 1e9,
            "pad_frac": (e_pad - e) / e,
            "n_superchunks": pln.n_sc,
            "plan_s": plan_s,
            "gather_floor_ms": gt * 1e3 * pln.n_sc,
            "roofline_frac": bytes_moved / dt / HBM_BW_BYTES,
        }
    if "hybrid" in methods:
        from textgcn_tpu.graph.reorder import reorder_and_build, spmm_hybrid

        t0 = time.perf_counter()
        perm, hg = reorder_and_build(
            row, col, val, n, symmetric=False, onehot_kwargs=dict(f_hint=f)
        )
        plan_s = time.perf_counter() - t0
        # SpMM operates in permuted space; permuting X once is part of setup
        xp = jnp.asarray(np.asarray(x)[np.argsort(perm)])
        dt = _time_fn(lambda a: spmm_hybrid(hg, a), xp)
        out["hybrid"] = {
            "ms": dt * 1e3,
            "edges_per_s": e / dt,
            "gflops": 2 * e * f / dt / 1e9,
            "dense_fraction": hg.dense_fraction,
            "nnzb": hg.bsr.blocks.shape[0],
            "plan_s": plan_s,
        }
    if "dense" in methods:
        import jax

        g = SparseGraph.from_coo(row, col, val, n, pad_to_multiple=8192)
        a_dense = g.to_dense()
        dt = _time_fn(
            lambda a: jnp.dot(a_dense, a, preferred_element_type=jnp.float32),
            xj,
        )
        bytes_moved = n * n * 4 + 2 * n * f * 4
        out["dense"] = {
            "ms": dt * 1e3,
            "edges_per_s": e / dt,
            "gflops": 2 * n * n * f / dt / 1e9,
            "roofline_frac": bytes_moved / dt / HBM_BW_BYTES,
        }
    for k, v in out.items():
        print(f"[{label}] {k}: " + json.dumps({kk: round(vv, 4) if isinstance(vv, float) else vv for kk, vv in v.items()}))
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--large", action="store_true", help="add 1M-node graph")
    p.add_argument("--f", type=int, default=200)
    p.add_argument("--only", default="", help="substring filter on benchmark labels")
    args = p.parse_args()

    def want(label):
        return args.only in label

    # R8-scale real graph if artifacts exist
    if want("R8"):
        try:
            from textgcn_tpu.train.prepare import load_graph_edges

            g = load_graph_edges("data/graph/R8_topic.txt", 7724)
            e = g.n_edges
            bench_graph(
                np.asarray(g.row)[:e],
                np.asarray(g.col)[:e],
                np.asarray(g.val)[:e],
                7724,
                f=args.f,
                label="R8 (7.7k nodes, 74k nnz)",
                methods=("segment", "bsr", "dense"),
            )
        except FileNotFoundError:
            print("[skip] no R8 artifacts")

    # uniform-sparse synthetic: segment-sum path (BSR dense-tile format is
    # wrong for uniform sparsity — its tiles would be ~0.05% occupied)
    if want("uniform 100k"):
        row, col, val = synthetic_powerlaw_graph(100_000, 50)
        bench_graph(
            row, col, val, 100_000, f=args.f,
            label="synthetic uniform 100k x 5M",
            methods=("segment", "onehot", "hybrid"),
        )

    # clustered synthetic shaped like a doc-topic graph (docs x 512 hub
    # columns): the BSR regime
    if want("clustered"):
        rng = np.random.RandomState(3)
        n, e = 200_000, 4_000_000
        row = rng.randint(0, n, e)
        col = rng.randint(0, 512, e)  # edges concentrate in 4 block-columns
        val = rng.rand(e).astype(np.float32)
        bench_graph(
            row, col, val, n, f=args.f,
            label="synthetic clustered 200k x 4M", methods=("segment", "bsr"),
        )

    if args.large and want("uniform 1M"):
        row, col, val = synthetic_powerlaw_graph(1_000_000, 32)
        bench_graph(
            row, col, val, 1_000_000, f=args.f,
            label="synthetic uniform 1M x 32M",
            methods=("segment", "onehot", "hybrid"),
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
