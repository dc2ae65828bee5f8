"""Per-piece timing of the kernel-path GAT layer on R8 docword + the
gather-style resolution (bench shifted-idx probe vs unique-row chunks).
One TPU process."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, reps=20):
    out = fn()
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), out)
    return (time.perf_counter() - t0) / reps


def main():
    res = {}

    # ---- gather style resolution
    def time_chained(fn, x0, reps, consts=()):
        chained = jax.jit(
            lambda v, *cs: lax.fori_loop(
                0, reps, lambda i, w: fn(i, w, *cs), v
            )
        )
        y = chained(x0, *consts)
        float(jnp.sum(y))
        t0 = time.perf_counter()
        y = chained(x0, *consts)
        float(jnp.sum(y))
        return (time.perf_counter() - t0) / reps

    for nt, ng, tag in [
        (1_000_000, 4_000_000, "1Mtbl_4Midx"),
        (10_000_000, 4_000_000, "10Mtbl_4Midx"),
        (15_362, 819_200, "15ktbl_819kidx"),
    ]:
        fd = 128
        tbl = jax.jit(
            lambda k: jax.random.normal(k, (nt, fd), jnp.float32)
        )(jax.random.PRNGKey(1))
        idx = jax.jit(
            lambda k: jax.random.randint(k, (ng,), 0, nt, dtype=jnp.int32)
        )(jax.random.PRNGKey(2))

        def gather_step(i, acc, tbl, idx):
            shifted = jax.lax.rem(idx + i, nt)
            return acc + jnp.sum(tbl[shifted])

        dt = time_chained(gather_step, jnp.zeros(()), 8, consts=(tbl, idx))
        res[f"gather_{tag}"] = ng / dt
        log(f"gather {tag}: {ng / dt / 1e6:.0f}M rows/s")
        tbl.delete()
        idx.delete()

    # ---- attention pieces on R8 docword
    from textgcn_tpu.models.gat import gat_forward, gat_init
    from textgcn_tpu.ops.pallas_attention import (
        attention_spmm,
        edge_logit_base,
        sddmm_slots,
        softmax_stats,
    )
    from textgcn_tpu.train.prepare import (
        apply_attention_format,
        prepare_docword_data,
    )

    pre = prepare_docword_data("R8", data_root="data")
    pre_k = apply_attention_format(pre)
    ag = pre_k.graph
    n = ag.n_nodes
    slots = ag.fwd.n_sc * ag.fwd.c_sc * ag.fwd.k
    log(f"slots={slots} edges={ag.n_edges}")
    rng = np.random.default_rng(0)
    h = jax.device_put(
        jnp.asarray(rng.normal(size=(n, 200)).astype(np.float32))
    )
    es = jnp.asarray(rng.normal(size=n).astype(np.float32))
    ed = jnp.asarray(rng.normal(size=n).astype(np.float32))

    elb = jax.jit(lambda a, b: edge_logit_base(ag, a, b))
    res["edge_logit_base_fwd_ms"] = timeit(lambda: elb(es, ed)) * 1e3

    logits = elb(es, ed)
    stats = jax.jit(lambda lg: softmax_stats(ag.fwd, lg))
    res["softmax_stats_ms"] = timeit(lambda: stats(logits)) * 1e3

    attn = jax.jit(lambda lg, hh: attention_spmm(ag, lg, hh))
    res["attention_spmm_fwd_ms"] = timeit(lambda: attn(logits, h)) * 1e3

    sd = jax.jit(lambda g, x: sddmm_slots(ag.fwd, g, x))
    res["sddmm_ms"] = timeit(lambda: sd(h, h)) * 1e3

    gfun = jax.jit(
        jax.grad(
            lambda lg, hh: jnp.sum(attention_spmm(ag, lg, hh)),
            argnums=(0, 1),
        )
    )
    res["attention_spmm_fwdbwd_ms"] = timeit(lambda: gfun(logits, h)) * 1e3

    gel = jax.jit(
        jax.grad(
            lambda a, b: jnp.sum(edge_logit_base(ag, a, b) ** 2),
            argnums=(0, 1),
        )
    )
    res["edge_logit_base_fwdbwd_ms"] = timeit(lambda: gel(es, ed)) * 1e3

    # whole-layer forward and train-step-ish grad
    params = gat_init(jax.random.PRNGKey(0), n, 200, 8)
    fwd = jax.jit(lambda p: gat_forward(p, ag, None, train=False))
    res["gat_forward_ms"] = timeit(lambda: fwd(params)) * 1e3
    step = jax.jit(
        jax.grad(lambda p: jnp.sum(gat_forward(p, ag, None, train=False)))
    )
    res["gat_fwdbwd_ms"] = timeit(lambda: step(params)) * 1e3

    for k, v in res.items():
        if k.endswith("_ms"):
            log(f"{k}: {v:.1f} ms")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
