"""Oracles for the plan-layout attention kernels
(textgcn_tpu/ops/pallas_attention.py) — round-4 verdict weak #2 (GAT off
the segment kernel) and missing #1 (Pallas SDDMM).

Pallas runs in interpret mode on the CPU test backend — identical numerics
to the compiled kernels (bf16 casts included), so tolerances below reflect
the kernel path's real bf16 aggregation precision vs the f32 segment path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textgcn_tpu.graph.structs import SparseGraph
from textgcn_tpu.models.gat import (
    gat_forward,
    gat_init,
    gat_layer,
    gat_layer_onehot,
    segment_softmax,
)
from textgcn_tpu.ops.pallas_attention import (
    AttentionGraph,
    attention_spmm,
    rowsum_slots,
    sddmm_slots,
    softmax_stats,
    spmm_onehot_ew,
)
from textgcn_tpu.ops.spmm import spmm_coo_segment_ew


def _random_graph(n, e, seed, symmetric=False):
    """Random COO with DEDUPLICATED (row, col) pairs: SparseGraph.from_coo
    coalesces duplicates, the plan layout keeps them — dedupe so segment-
    path oracles see the same edge set."""
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e).astype(np.int64)
    col = rng.integers(0, n, e).astype(np.int64)
    _, keep = np.unique(row * n + col, return_index=True)
    row, col = row[keep], col[keep]
    val = (rng.random(len(row)) * 0.9 + 0.1).astype(np.float64)
    if symmetric:
        mask = row < col
        row, col = (
            np.concatenate([row[mask], col[mask]]),
            np.concatenate([col[mask], row[mask]]),
        )
        val = np.concatenate([val[mask], val[mask]])
    return row, col, val


def _slot_logits(ag, edge_logits):
    """Edge-order logits -> fwd-slot layout (phantoms -inf)."""
    flat = np.full(ag.fwd.n_sc * ag.fwd.c_sc * ag.fwd.k, -np.inf, np.float32)
    flat[np.asarray(ag.fwd_dst)] = edge_logits
    return jnp.asarray(flat.reshape(ag.fwd.n_sc, -1))


def _make(n=100, e=900, seed=0, k=128, w=8, **kw):
    row, col, val = _random_graph(n, e, seed)
    ag = AttentionGraph.from_coo(row, col, val, n, w=w, k=k, **kw)
    return (row, col, val), ag


def test_softmax_stats_oracle():
    (row, col, val), ag = _make()
    rng = np.random.default_rng(1)
    elog = rng.normal(size=len(row)).astype(np.float32)
    logits = _slot_logits(ag, elog)
    mx, sm = softmax_stats(ag.fwd, logits, interpret=True)
    mx = np.asarray(mx[:, 0])
    sm = np.asarray(sm[:, 0])
    n = ag.n_nodes
    for r in range(n):
        mask = row == r
        if not mask.any():
            assert sm[r] == 0.0
            continue
        m_ref = elog[mask].max()
        s_ref = np.exp(elog[mask] - m_ref).sum()
        np.testing.assert_allclose(mx[r], m_ref, rtol=1e-6)
        np.testing.assert_allclose(sm[r], s_ref, rtol=1e-5)


def test_rowsum_slots_oracle():
    (row, col, val), ag = _make(seed=2)
    rng = np.random.default_rng(3)
    ev = rng.normal(size=len(row)).astype(np.float32)
    flat = np.zeros(ag.fwd.n_sc * ag.fwd.c_sc * ag.fwd.k, np.float32)
    flat[np.asarray(ag.fwd_dst)] = ev
    out = rowsum_slots(
        ag.fwd, jnp.asarray(flat.reshape(ag.fwd.n_sc, -1)), interpret=True
    )
    out = np.asarray(out[:, 0])
    want = np.zeros(out.shape[0])
    np.add.at(want, row, ev)
    np.testing.assert_allclose(out[: ag.n_nodes], want[: ag.n_nodes],
                               rtol=1e-5, atol=1e-5)


def test_sddmm_slots_oracle():
    (row, col, val), ag = _make(seed=4)
    rng = np.random.default_rng(5)
    f = 16
    g = rng.normal(size=(ag.n_nodes, f)).astype(np.float32)
    x = rng.normal(size=(ag.n_nodes, f)).astype(np.float32)
    u = np.asarray(
        sddmm_slots(ag.fwd, jnp.asarray(g), jnp.asarray(x), interpret=True)
    ).reshape(-1)
    got = u[np.asarray(ag.fwd_dst)]
    want = np.sum(
        g.astype(np.float32)[row] * x.astype(np.float32)[col], axis=1
    )
    # bf16 feature casts inside the kernel: tolerance is bf16-level
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_attention_spmm_matches_segment_softmax():
    (row, col, val), ag = _make(n=80, e=700, seed=6)
    n = ag.n_nodes
    g = SparseGraph.from_coo(row, col, val, n)
    rng = np.random.default_rng(7)
    elog_sorted = rng.normal(size=len(row)).astype(np.float32)
    # SparseGraph sorts edges by row; build edge-order logits aligned to
    # the ORIGINAL order for the slot map, sorted order for the oracle
    order = np.argsort(row, kind="stable")
    elog_orig = np.empty_like(elog_sorted)
    elog_orig[order] = elog_sorted
    x = rng.normal(size=(n, 24)).astype(np.float32)

    att = segment_softmax(
        jnp.asarray(elog_sorted), g.row[: len(row)], n
    )
    want = np.zeros((n, 24), np.float32)
    srow = np.asarray(g.row[: len(row)])
    scol = np.asarray(g.col[: len(row)])
    np.add.at(want, srow, np.asarray(att)[:, None] * x[scol])

    logits = _slot_logits(ag, elog_orig)
    got = attention_spmm(ag, logits, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=3e-2)


def test_attention_spmm_grads_match_autodiff_oracle():
    (row, col, val), ag = _make(n=60, e=500, seed=8)
    n = ag.n_nodes
    rng = np.random.default_rng(9)
    elog = rng.normal(size=len(row)).astype(np.float32)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    t = rng.normal(size=(n, 16)).astype(np.float32)
    srow = jnp.asarray(np.sort(row))
    order = np.argsort(row, kind="stable")
    scol = jnp.asarray(col[order])

    def oracle(el_sorted, xx):
        att = segment_softmax(el_sorted, srow, n)
        out = spmm_coo_segment_ew(srow, scol, att, xx, n, True)
        return jnp.sum(out * t)

    def kernel(el_orig, xx):
        logits = jnp.full(
            ag.fwd.n_sc * ag.fwd.c_sc * ag.fwd.k, -jnp.inf, jnp.float32
        ).at[ag.fwd_dst].set(el_orig).reshape(ag.fwd.n_sc, -1)
        out = attention_spmm(ag, logits, xx, True)
        return jnp.sum(out * t)

    el_sorted = jnp.asarray(elog[order])
    g_or = jax.grad(oracle, argnums=(0, 1))(el_sorted, jnp.asarray(x))
    g_kn = jax.grad(kernel, argnums=(0, 1))(jnp.asarray(elog), jnp.asarray(x))
    # compare edge-order logit grads
    g_log_or = np.empty(len(row), np.float32)
    g_log_or[order] = np.asarray(g_or[0])
    np.testing.assert_allclose(
        np.asarray(g_kn[0]), g_log_or, rtol=5e-2, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(g_kn[1]), np.asarray(g_or[1]), rtol=5e-2, atol=5e-2
    )


def test_spmm_onehot_ew_matches_segment_ew():
    (row, col, val), ag = _make(n=70, e=600, seed=10)
    n = ag.n_nodes
    rng = np.random.default_rng(11)
    ev = (rng.random(len(row)) + 0.1).astype(np.float32)
    x = rng.normal(size=(n, 20)).astype(np.float32)
    t = rng.normal(size=(n, 20)).astype(np.float32)
    order = np.argsort(row, kind="stable")
    srow = jnp.asarray(np.sort(row))
    scol = jnp.asarray(col[order])

    def oracle(vv_sorted, xx):
        return jnp.sum(
            spmm_coo_segment_ew(srow, scol, vv_sorted, xx, n, True) * t
        )

    def kernel(vv_orig, xx):
        slots = jnp.zeros(
            ag.fwd.n_sc * ag.fwd.c_sc * ag.fwd.k, jnp.float32
        ).at[ag.fwd_dst].set(vv_orig).reshape(ag.fwd.n_sc, -1)
        return jnp.sum(spmm_onehot_ew(ag, slots, xx, True) * t)

    v_sorted = jnp.asarray(ev[order])
    f_or, g_or = jax.value_and_grad(oracle, argnums=(0, 1))(
        v_sorted, jnp.asarray(x)
    )
    f_kn, g_kn = jax.value_and_grad(kernel, argnums=(0, 1))(
        jnp.asarray(ev), jnp.asarray(x)
    )
    np.testing.assert_allclose(float(f_kn), float(f_or), rtol=2e-2)
    g_val_or = np.empty(len(row), np.float32)
    g_val_or[order] = np.asarray(g_or[0])
    np.testing.assert_allclose(
        np.asarray(g_kn[0]), g_val_or, rtol=5e-2, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(g_kn[1]), np.asarray(g_or[1]), rtol=5e-2, atol=5e-2
    )


def test_gat_forward_kernel_path_matches_segment():
    n, e = 90, 800
    row, col, val = _random_graph(n, e // 2, seed=12, symmetric=True)
    g = SparseGraph.from_coo(row, col, val, n)
    ag = AttentionGraph.from_coo(row, col, val, n, w=8, k=128)
    params = gat_init(jax.random.PRNGKey(0), 12, 16, 4)
    x = jnp.asarray(
        np.random.default_rng(13).normal(size=(n, 12)).astype(np.float32)
    )
    seg = gat_forward(params, g, x)
    ker = gat_forward(params, ag, x)
    np.testing.assert_allclose(
        np.asarray(ker), np.asarray(seg), rtol=5e-2, atol=5e-2
    )


def test_attention_multi_superchunk():
    # force several superchunks: stats/agg/sddmm must stay correct across
    # the superchunk split
    (row, col, val), ag = _make(
        n=200, e=2500, seed=14, max_p_bytes=64 * 128 * 4, f_hint=16
    )
    assert ag.fwd.n_sc > 1
    n = ag.n_nodes
    rng = np.random.default_rng(15)
    elog = rng.normal(size=len(row)).astype(np.float32)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    logits = _slot_logits(ag, elog)
    got = attention_spmm(ag, logits, jnp.asarray(x), True)
    order = np.argsort(row, kind="stable")
    att = segment_softmax(
        jnp.asarray(elog[order]), jnp.asarray(np.sort(row)), n
    )
    want = np.zeros((n, 16), np.float32)
    np.add.at(
        want, np.sort(row), np.asarray(att)[:, None] * x[col[order]]
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=3e-2)


def test_gat_attention_fused_grads_match_oracle():
    """The fused gat_attention op (logits built in-kernel) == the
    segment-path math, values AND (es, ed, x) gradients."""
    from textgcn_tpu.ops.pallas_attention import gat_attention

    (row, col, val), ag = _make(n=60, e=500, seed=20)
    n = ag.n_nodes
    rng = np.random.default_rng(21)
    es = rng.normal(size=n).astype(np.float32)
    ed = rng.normal(size=n).astype(np.float32)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    t = rng.normal(size=(n, 16)).astype(np.float32)
    order = np.argsort(row, kind="stable")
    srow = jnp.asarray(np.sort(row))
    scol = jnp.asarray(col[order])
    sval = jnp.asarray(val[order].astype(np.float32))

    def oracle(a, b, xx):
        from textgcn_tpu.models.gat import segment_softmax

        e = jax.nn.leaky_relu(a[srow] + b[scol], 0.2) + jnp.log(sval)
        att = segment_softmax(e, srow, n)
        out = spmm_coo_segment_ew(srow, scol, att, xx, n, True)
        return jnp.sum(out * t)

    def fused(a, b, xx):
        return jnp.sum(gat_attention(ag, a, b, xx, 0.2, True) * t)

    args = (jnp.asarray(es), jnp.asarray(ed), jnp.asarray(x))
    f_or, g_or = jax.value_and_grad(oracle, argnums=(0, 1, 2))(*args)
    f_fu, g_fu = jax.value_and_grad(fused, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(f_fu), float(f_or), rtol=2e-2)
    for a, b in zip(g_fu, g_or):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-2
        )
