"""Degree-sort reordering + hybrid BSR/one-hot SpMM vs scipy oracle (CPU,
Pallas interpreter mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from textgcn_tpu.graph.reorder import (
    HybridGraph,
    degree_sort_permutation,
    permute_coo,
    reorder_and_build,
    spmm_hybrid,
    tile_fill_threshold_split,
)


def _powerlaw_coo(n=600, e=6000, seed=0):
    """Symmetric power-law-ish COO with duplicate edges coalesced."""
    rng = np.random.RandomState(seed)
    p = (np.arange(1, n + 1) ** -0.8)
    p /= p.sum()
    r = rng.choice(n, size=e, p=p)
    c = rng.choice(n, size=e, p=p)
    keep = r != c
    r, c = r[keep], c[keep]
    # symmetrize + coalesce
    rr = np.concatenate([r, c])
    cc = np.concatenate([c, r])
    m = sp.coo_matrix((np.ones(len(rr)), (rr, cc)), shape=(n, n)).tocsr()
    m.sum_duplicates()
    m = m.tocoo()
    # symmetric values: derive from min(row,col),max(row,col) hash
    a, b = np.minimum(m.row, m.col), np.maximum(m.row, m.col)
    val = ((a * 31 + b * 7) % 97 + 1) / 97.0
    return m.row.astype(np.int64), m.col.astype(np.int64), val, n


def test_degree_sort_permutation_is_permutation():
    r, c, v, n = _powerlaw_coo()
    perm = degree_sort_permutation(r, c, n)
    assert sorted(perm.tolist()) == list(range(n))
    deg = np.bincount(r, minlength=n) + np.bincount(c, minlength=n)
    new_deg = np.empty(n)
    new_deg[perm] = deg
    # hubs first: new-id order is non-increasing degree
    assert (np.diff(new_deg) <= 0).all()


def test_tile_split_symmetric_and_budget():
    r, c, v, n = _powerlaw_coo()
    perm = degree_sort_permutation(r, c, n)
    r2, c2, v2 = permute_coo(r, c, v, perm)
    mask = tile_fill_threshold_split(r2, c2, n, bm=64, bn=64, min_nnz=16)
    # symmetric pattern -> symmetric split: the selected edge set must be
    # closed under transposition
    sel = set(zip(r2[mask].tolist(), c2[mask].tolist()))
    assert all((b, a) in sel for a, b in sel)
    # byte budget: 1 tile only
    tiny = tile_fill_threshold_split(
        r2, c2, n, bm=64, bn=64, min_nnz=1, max_block_bytes=64 * 64 * 4
    )
    key = (r2[tiny] // 64) * ((n + 63) // 64) + (c2[tiny] // 64)
    assert len(np.unique(key)) <= 1


def test_hybrid_spmm_matches_scipy_oracle():
    r, c, v, n = _powerlaw_coo()
    perm, h = reorder_and_build(
        r, c, v, n, symmetric=True, bm=64, bn=64, min_nnz=16,
        onehot_kwargs=dict(k=128, w=64), store_bf16=False,
    )
    assert 0.0 < h.dense_fraction < 1.0, h.dense_fraction
    f = 48
    x = np.random.RandomState(3).randn(n, f).astype(np.float32)
    r2, c2, v2 = permute_coo(r, c, v, perm)
    want = sp.coo_matrix((v2, (r2, c2)), shape=(n, n)) @ x
    got = np.asarray(spmm_hybrid(h, jnp.asarray(x), True, False))
    # residual edges stream as bf16 products (pallas_onehot design)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_hybrid_spmm_permutation_roundtrip():
    """P Â Pᵀ (P x) == P (Â x): hybrid on the permuted graph reproduces the
    original-space product after un-permutation."""
    r, c, v, n = _powerlaw_coo(seed=5)
    perm, h = reorder_and_build(
        r, c, v, n, symmetric=True, bm=64, bn=64, min_nnz=16,
        onehot_kwargs=dict(k=128, w=64), store_bf16=False,
    )
    f = 16
    x = np.random.RandomState(7).randn(n, f).astype(np.float32)
    xp = np.empty_like(x)
    xp[perm] = x  # P x
    got_p = np.asarray(spmm_hybrid(h, jnp.asarray(xp), True, False))
    got = got_p[perm]  # un-permute rows back to original ids
    want = sp.coo_matrix((v, (r, c)), shape=(n, n)) @ x
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_hybrid_vjp_symmetric():
    r, c, v, n = _powerlaw_coo(seed=9)
    perm, h = reorder_and_build(
        r, c, v, n, symmetric=True, bm=64, bn=64, min_nnz=16,
        onehot_kwargs=dict(k=128, w=64), store_bf16=False,
    )
    f = 8
    x = jnp.asarray(np.random.RandomState(1).randn(n, f).astype(np.float32))

    def loss(x):
        y = spmm_hybrid(h, x, True, False)
        return jnp.sum(y**2)

    g = jax.grad(loss)(x)
    # d/dx sum((Ax)^2) = 2 Aᵀ A x = 2 A A x for symmetric A
    ax = spmm_hybrid(h, x, True, False)
    want = 2.0 * spmm_hybrid(h, ax, True, False)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_hybrid_all_dense_edge_case():
    """Every edge in one tile -> rest is None and SpMM still works."""
    n = 32
    r = np.repeat(np.arange(8), 8)
    c = np.tile(np.arange(8), 8)
    v = np.ones(64)
    h = HybridGraph.from_coo(
        r, c, v, n, symmetric=False, bm=32, bn=32, min_nnz=1,
        store_bf16=False,
    )
    assert h.rest is None and h.dense_fraction == 1.0
    x = np.random.RandomState(0).randn(n, 8).astype(np.float32)
    want = sp.coo_matrix((v, (r, c)), shape=(n, n)) @ x
    got = np.asarray(spmm_hybrid(h, jnp.asarray(x), True, False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
