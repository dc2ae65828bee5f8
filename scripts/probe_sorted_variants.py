"""One-process probe attributing the sorted-stream pass time at the
BASELINE scale: PRNG generation cost, gather wall, and kernel variants
(window size / grid step size / dispatch segmentation). One TPU claim,
variants run sequentially (tunnel rule: one process at a time)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from textgcn_tpu.ops.streamed_sorted import (
    make_lattice_edge_fn,
    spmm_streamed_sorted,
    spmm_streamed_sorted_multi,
)

DEG = 50
G = 16384
N_CHUNKS = 610
F = 128


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed(fn, reps=3):
    out = fn()  # compile + warmup
    cs = float(jnp.sum(out))
    out.delete()
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn()
        cs = float(jnp.sum(out))
        if i < reps - 1:
            out.delete()
    dt = (time.perf_counter() - t0) / reps
    out.delete()
    return dt, cs


def main():
    results = {}

    # --- gather-only wall: random gather of E bf16 rows + cheap row-sum
    n_pad = N_CHUNKS * G
    x = jax.jit(
        lambda k: jax.random.normal(k, (n_pad, F), dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(42))
    e_total = n_pad * DEG
    chunk_e = 819_200
    n_gchunks = e_total // chunk_e

    @jax.jit
    def gather_only(xx):
        def body(i, acc):
            k = jax.random.fold_in(jax.random.PRNGKey(9), i)
            col = jax.random.randint(
                k, (chunk_e,), 0, n_pad, dtype=jnp.int32
            )
            return acc + jnp.sum(
                jnp.take(xx, col, axis=0).astype(jnp.float32), axis=0
            )

        return jax.lax.fori_loop(0, n_gchunks, body, jnp.zeros((F,)))

    dt, cs = timed(lambda: gather_only(x))
    log(f"gather_only: {dt:.2f}s ({e_total / dt / 1e6:.0f}M rows/s)")
    results["gather_only_s"] = dt

    # --- generation-only: lattice PRNG + layout, no gather/reduce
    for (w, w_sc) in [(512, 32), (1024, 16)]:
        cell_e = DEG * w // w_sc
        per_window = w_sc * cell_e
        k = next(
            kk for kk in (4096, 2048, 1024, 512) if per_window % kk == 0
        )
        edge_fn, spec = make_lattice_edge_fn(N_CHUNKS, w_sc, w, cell_e, k)
        e = N_CHUNKS * spec.chunk_edges

        @jax.jit
        def gen_only():
            def body(i, acc):
                col, val, lrow, wloc, wbase = edge_fn(i)
                return (
                    acc
                    + jnp.sum(col).astype(jnp.float32)
                    + jnp.sum(lrow).astype(jnp.float32)
                    + jnp.sum(val)
                )

            return jax.lax.fori_loop(
                0, N_CHUNKS, body, jnp.zeros((), jnp.float32)
            )

        out = gen_only()
        float(out)
        t0 = time.perf_counter()
        out = gen_only()
        float(out)
        dtg = time.perf_counter() - t0
        log(
            f"gen_only w={w} w_sc={w_sc} k={k}: {dtg:.2f}s "
            f"({e / dtg / 1e6:.0f}M edges/s)"
        )
        results[f"gen_only_w{w}_s"] = dtg

        # --- full sorted pass, monolithic
        dt, cs = timed(
            lambda: spmm_streamed_sorted(edge_fn, x, N_CHUNKS, spec)
        )
        log(
            f"sorted w={w} w_sc={w_sc} k={k}: {dt:.2f}s "
            f"({e / dt / 1e6:.0f}M edges/s) checksum={cs:.4g}"
        )
        results[f"sorted_w{w}_s"] = dt

        # --- segmented dispatches (train-path execution mode)
        dt, cs = timed(
            lambda: spmm_streamed_sorted_multi(
                edge_fn, x, N_CHUNKS, spec, chunks_per_dispatch=16
            )
        )
        log(f"sorted_multi16 w={w}: {dt:.2f}s ({e / dt / 1e6:.0f}M edges/s)")
        results[f"sorted_multi16_w{w}_s"] = dt

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
