"""Decompose uniform-sparsity SpMM cost on the real TPU.

Measures, for a uniform random graph (row-sorted COO), the pieces of
`spmm_coo_segment`:
  1. raw row gather        p = xp[col]                  (random 512B reads)
  2. fused gather-scale    p = xp[col] * val[:, None]
  3. sorted segment_sum of a precomputed [E, F]         (the scatter side)
  4. full spmm_coo_segment                              (today's kernel)
  5. one-hot batched-matmul segment reduce (pure XLA)   (candidate phase 2)

Timings force a scalar readback per iteration (axon tunnel does not block
on block_until_ready).

Run: nohup python benchmarks/gather_probe.py > /tmp/gather_probe.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_000
DEG = 8  # E = 8M so [E, F] f32 (4 GB) + temps fit 16 GB HBM
F = 128
STEPS = 5


def timeit(fn, *args):
    out = fn(*args)
    import jax.numpy as jnp

    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / STEPS


def main():
    import jax
    import jax.numpy as jnp

    e = N * DEG
    rng = np.random.RandomState(0)
    row = np.sort(rng.randint(0, N, e).astype(np.int32))
    col = rng.randint(0, N, e).astype(np.int32)
    val = (rng.rand(e) * 0.5 + 0.5).astype(np.float32)
    x = rng.randn(N, F).astype(np.float32)

    rowj = jnp.asarray(row)
    colj = jnp.asarray(col)
    valj = jnp.asarray(val)
    xj = jnp.asarray(x)
    print(f"[probe] N={N} E={e} F={F}", file=sys.stderr, flush=True)

    gather = jax.jit(lambda xx, cc: xx[cc])
    t = timeit(gather, xj, colj)
    print(json.dumps({"op": "gather", "ms": t * 1e3, "gbps": e * F * 4 * 2 / t / 1e9}), flush=True)

    gscale = jax.jit(lambda xx, cc, vv: xx[cc] * vv[:, None])
    t = timeit(gscale, xj, colj, valj)
    print(json.dumps({"op": "gather_scale", "ms": t * 1e3}), flush=True)

    gscale_bf16 = jax.jit(
        lambda xx, cc, vv: (xx[cc] * vv[:, None]).astype(jnp.bfloat16)
    )
    t = timeit(gscale_bf16, xj, colj, valj)
    print(json.dumps({"op": "gather_scale_bf16", "ms": t * 1e3}), flush=True)

    p = jax.jit(lambda xx, cc, vv: xx[cc] * vv[:, None])(xj, colj, valj)
    float(jnp.sum(p))
    seg = jax.jit(
        lambda pp, rr: jax.ops.segment_sum(
            pp, rr, num_segments=N, indices_are_sorted=True
        )
    )
    t = timeit(seg, p, rowj)
    print(json.dumps({"op": "segment_sum_sorted", "ms": t * 1e3}), flush=True)

    seg_u = jax.jit(
        lambda pp, rr: jax.ops.segment_sum(
            pp, rr, num_segments=N, indices_are_sorted=False
        )
    )
    t = timeit(seg_u, p, rowj)
    print(json.dumps({"op": "segment_sum_unsorted", "ms": t * 1e3}), flush=True)

    from textgcn_tpu.ops.spmm import spmm_coo_segment

    full = jax.jit(lambda rr, cc, vv, xx: spmm_coo_segment(rr, cc, vv, xx, N))
    t = timeit(full, rowj, colj, valj, xj)
    print(
        json.dumps(
            {"op": "spmm_coo_segment", "ms": t * 1e3, "edges_per_s": e / t}
        ),
        flush=True,
    )

    # one-hot batched matmul segment reduce, pure XLA: chunks of K edges,
    # each chunk one-hot (W, K) against a W-row output window; chunk->window
    # assignment precomputed host-side with padding so no chunk straddles.
    K, W = 2048, 512
    # host plan: pad edge stream at window boundaries
    win = row // W
    # edges per window
    counts = np.bincount(win, minlength=(N + W - 1) // W)
    n_win = len(counts)
    chunks_per_win = np.maximum(1, -(-counts // K))
    tot_chunks = int(chunks_per_win.sum())
    e_pad = tot_chunks * K
    col_p = np.zeros(e_pad, dtype=np.int32)
    val_p = np.zeros(e_pad, dtype=np.float32)
    lrow_p = np.full(e_pad, W, dtype=np.int32)  # W = phantom local row
    win_of_chunk = np.zeros(tot_chunks, dtype=np.int32)
    src_off = np.concatenate([[0], np.cumsum(counts)])
    dst = 0
    ci = 0
    for w in range(n_win):
        c = counts[w]
        s = src_off[w]
        col_p[dst : dst + c] = col[s : s + c]
        val_p[dst : dst + c] = val[s : s + c]
        lrow_p[dst : dst + c] = row[s : s + c] - w * W
        nc = chunks_per_win[w]
        win_of_chunk[ci : ci + nc] = w
        ci += nc
        dst += nc * K
    print(
        f"[plan] chunks={tot_chunks} pad={(e_pad - e) / e:.1%}",
        file=sys.stderr,
        flush=True,
    )

    col_pj = jnp.asarray(col_p)
    val_pj = jnp.asarray(val_p)
    lrow_pj = jnp.asarray(lrow_p.reshape(tot_chunks, K))
    woc = jnp.asarray(win_of_chunk)

    def onehot_reduce(xx, cc, vv, lr, wc):
        pp = (xx[cc] * vv[:, None]).astype(jnp.bfloat16)
        pp = pp.reshape(tot_chunks, K, F)
        s = (
            lr[:, None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        ).astype(jnp.bfloat16)  # [C, W, K]
        part = jax.lax.dot_general(
            s,
            pp,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [C, W, F]
        out = jax.ops.segment_sum(
            part, wc, num_segments=n_win, indices_are_sorted=True
        )
        return out.reshape(n_win * W, F)[:N]

    oh = jax.jit(onehot_reduce)
    t = timeit(oh, xj, col_pj, val_pj, lrow_pj, woc)
    print(
        json.dumps(
            {"op": "onehot_xla", "ms": t * 1e3, "edges_per_s": e / t}
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
