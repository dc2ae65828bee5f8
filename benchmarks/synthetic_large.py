"""Large-graph full-training-step benchmark.

Scaled realization of BASELINE.json's "synthetic 10M-node / 500M-edge,
256-dim features, edge-partitioned across hosts" config. This machine has
ONE TPU v5e chip, so the benchmark measures (a) the largest per-chip slice —
the multi-host run is this slice × hosts with the halo exchange measured in
benchmarks/scaling_bench.py — and (b) the sharded (mesh) code path on a
virtual mesh for methodology.

Defaults fit one v5e HBM: 2M nodes, 50M edges, F=128 (scale with --n/--deg).
Reports per-step time and edges/s for forward and train step.

Run: python benchmarks/synthetic_large.py [--n 2000000] [--deg 25] [--f 128]
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
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--deg", type=int, default=25)
    p.add_argument("--f", type=int, default=128)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--classes", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument(
        "--kernel",
        choices=("segment", "onehot"),
        default="segment",
        help="SpMM path: XLA gather+segment_sum, or the Pallas one-hot "
        "MXU reducer (uniform-sparsity hot kernel)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from textgcn_tpu.graph.structs import SparseGraph
    from textgcn_tpu.models.gcn import gcn_forward, gcn_init
    from textgcn_tpu.train.trainer import _adam

    n, e = args.n, args.n * args.deg
    rng = np.random.RandomState(0)
    print(f"[gen] {n} nodes, {e} edges, F={args.f}", file=sys.stderr, flush=True)
    row = rng.randint(0, n, e).astype(np.int64)
    col = rng.randint(0, n, e).astype(np.int64)
    val = (rng.rand(e) * 0.5 + 0.5).astype(np.float32)
    # row-normalized-ish weights; skip full sym-normalize (host cost) — the
    # kernel timing is identical
    if args.kernel == "onehot":
        from textgcn_tpu.ops.pallas_onehot import OneHotGraph

        t0 = time.perf_counter()
        g = OneHotGraph.from_coo(
            row, col, val, n, f_hint=max(args.f, args.hidden)
        )
        print(
            f"[plan] onehot fwd+bwd built in {time.perf_counter() - t0:.1f}s"
            f" ({g.fwd.n_sc} superchunks)",
            file=sys.stderr,
            flush=True,
        )
    else:
        g = SparseGraph.from_coo(row, col, val, n, pad_to_multiple=1 << 20)
    x = rng.randn(n, args.f).astype(np.float32)
    y = rng.randint(0, args.classes, n).astype(np.int32)
    train_idx = np.arange(0, n, 7).astype(np.int32)  # ~14% labeled

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)
    ti = jnp.asarray(train_idx)
    params = gcn_init(jax.random.PRNGKey(0), args.f, args.hidden, args.classes)
    print("[gen] device put done", file=sys.stderr, flush=True)

    # forward — NOTE: the graph must be a jit ARGUMENT; closing over it
    # bakes the COO arrays into the HLO as constants (hundreds of MB of
    # compile payload)
    fwd = jax.jit(lambda p, gg, xx: gcn_forward(p, gg, xx, train=False))
    out = fwd(params, g, xj)
    # scalar readback per timing window: through the axon tunnel,
    # block_until_ready does not block on device execution
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = fwd(params, g, xj)
    float(jnp.sum(out))
    dt_f = (time.perf_counter() - t0) / args.steps
    print(
        json.dumps(
            {
                "phase": "forward",
                "ms": dt_f * 1e3,
                "edges_per_s": 2 * e / dt_f,  # two SpMM layers
            }
        ),
        flush=True,
    )

    opt = _adam()
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, gg, xx, yy, tidx, rng):
        def loss_fn(p):
            logits = gcn_forward(p, gg, xx, dropout=0.5, train=True, rng=rng)
            sel = logits[tidx]
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(sel, yy[tidx])
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, g, xj, yj, ti, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, g, xj, yj, ti, k)
    float(loss)
    dt_s = (time.perf_counter() - t0) / args.steps
    # fwd 2 SpMM + bwd ~2 SpMM (transpose) per layer pair ≈ 4-6 SpMM-equiv
    print(
        json.dumps(
            {
                "phase": "train_step",
                "ms": dt_s * 1e3,
                "edges_per_s_fwdbwd": 6 * e / dt_s,
                "loss": float(loss),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
