"""Gather-wall attribution: rate vs table size, dtype, and index order.
Determines the honest bound for the 10M-row streamed config and whether
intra-chunk sorted gathers (legal in the plan layout) lift the wall."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def gather_probe(n_rows, f, dtype, order, chunk_e=819_200, n_chunks=200):
    x = jax.jit(
        lambda k: jax.random.normal(k, (n_rows, f), dtype=dtype)
    )(jax.random.PRNGKey(1))

    @jax.jit
    def run(xx):
        def body(i, acc):
            k = jax.random.fold_in(jax.random.PRNGKey(7), i)
            col = jax.random.randint(
                k, (chunk_e,), 0, n_rows, dtype=jnp.int32
            )
            if order == "sorted_k":  # ascending within 1024-slot blocks
                col = jnp.sort(col.reshape(-1, 1024), axis=1).reshape(-1)
            elif order == "sorted_chunk":
                col = jnp.sort(col)
            return acc + jnp.sum(
                jnp.take(xx, col, axis=0).astype(jnp.float32), axis=0
            )

        return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((f,)))

    out = run(x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(x)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    x.delete()
    rows = chunk_e * n_chunks
    return dt, rows / dt


def main():
    res = {}
    cases = [
        ("10M_bf16_random", 10_000_000, jnp.bfloat16, "random"),
        ("10M_bf16_sorted_k", 10_000_000, jnp.bfloat16, "sorted_k"),
        ("10M_bf16_sorted_chunk", 10_000_000, jnp.bfloat16, "sorted_chunk"),
        ("10M_f32_random", 10_000_000, jnp.float32, "random"),
        ("1M_bf16_random", 1_000_000, jnp.bfloat16, "random"),
        ("1M_f32_random", 1_000_000, jnp.float32, "random"),
    ]
    for name, n, dt_, order in cases:
        dt, rate = gather_probe(n, 128, dt_, order)
        log(f"{name}: {dt:.2f}s ({rate / 1e6:.0f}M rows/s)")
        res[name] = {"s": dt, "rows_per_s": rate}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
