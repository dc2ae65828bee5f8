"""Gather + one-hot-MXU SpMM vs dense oracle (Pallas in interpreter mode).

Covers: uneven F (lane padding), n_nodes not a multiple of the window,
empty windows, multi-superchunk scan path, gradient via the transpose plan,
and symmetric plan sharing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from textgcn_tpu.graph.structs import SparseGraph
from textgcn_tpu.ops.pallas_onehot import (
    OneHotGraph,
    build_onehot_plan,
    spmm_onehot,
)

# bf16 X gather + bf16 edge products (f32 accumulation): ~2-3 decimal digits
RTOL, ATOL = 5e-2, 1e-1


def _random_graph(n, nnz, seed=0):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, nnz)
    col = rng.randint(0, n, nnz)
    val = rng.randn(nnz)
    m = sp.coo_matrix((val, (row, col)), shape=(n, n))
    m.sum_duplicates()
    return (m.tocoo() + sp.eye(n)).tocoo()


@pytest.mark.parametrize(
    "n,nnz,f,k,w",
    [
        (64, 300, 16, 128, 8),
        (200, 2000, 64, 128, 16),
        (300, 50, 7, 128, 32),  # mostly-empty windows, uneven F
        (513, 4000, 130, 256, 64),  # n % w != 0, f % 128 != 0
    ],
)
def test_onehot_matches_dense(n, nnz, f, k, w):
    m = _random_graph(n, nnz)
    x = np.random.RandomState(1).randn(n, f).astype(np.float32)
    g = OneHotGraph.from_coo(m.row, m.col, m.data, n, k=k, w=w)
    got = np.asarray(spmm_onehot(g.fwd, g.bwd, jnp.asarray(x), True))
    want = m.toarray() @ x
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_onehot_multi_superchunk_matches_single():
    n, nnz, f = 256, 3000, 32
    m = _random_graph(n, nnz, seed=3)
    x = jnp.asarray(np.random.RandomState(2).randn(n, f).astype(np.float32))
    p1 = build_onehot_plan(m.row, m.col, m.data, n, k=128, w=16)
    # tiny budget forces several superchunks through the lax.scan path
    pN = build_onehot_plan(
        m.row, m.col, m.data, n, k=128, w=16, max_p_bytes=128 * 128 * 2 * 4
    )
    assert p1.n_sc == 1 and pN.n_sc > 1
    y1 = np.asarray(spmm_onehot(p1, p1, x, True))
    yN = np.asarray(spmm_onehot(pN, pN, x, True))
    np.testing.assert_allclose(y1, yN, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y1, m.toarray() @ np.asarray(x), rtol=RTOL, atol=ATOL)


def test_onehot_grad_via_transpose_plan():
    n, f = 96, 24
    m = _random_graph(n, 600, seed=5)
    g = OneHotGraph.from_coo(m.row, m.col, m.data, n, k=128, w=16)
    x = jnp.asarray(np.random.RandomState(4).randn(n, f).astype(np.float32))

    def loss(x):
        return jnp.sum(spmm_onehot(g.fwd, g.bwd, x, True) ** 2)

    grad = np.asarray(jax.grad(loss)(x))
    a = m.toarray()
    want = 2.0 * a.T @ (a @ np.asarray(x))
    # two chained bf16 product streams (fwd then bwd) compound the rounding
    np.testing.assert_allclose(grad, want, rtol=5e-2, atol=0.4)


def test_symmetric_plan_is_shared():
    n = 64
    m = _random_graph(n, 400, seed=7)
    sym = ((m + m.T) * 0.5).tocoo()
    g = OneHotGraph.from_coo(sym.row, sym.col, sym.data, n, symmetric=True)
    assert g.bwd is g.fwd
    x = jnp.asarray(np.random.RandomState(6).randn(n, 12).astype(np.float32))
    got = np.asarray(spmm_onehot(g.fwd, g.bwd, x, True))
    np.testing.assert_allclose(got, sym.toarray() @ np.asarray(x), rtol=RTOL, atol=ATOL)


def test_from_sparse_graph_roundtrip():
    n = 100
    m = _random_graph(n, 700, seed=9)
    sg = SparseGraph.from_coo(m.row, m.col, m.data, n, pad_to_multiple=256)
    g = OneHotGraph.from_sparse_graph(sg, k=128, w=16)
    assert g.n_edges == sg.n_edges
    x = jnp.asarray(np.random.RandomState(8).randn(n, 40).astype(np.float32))
    got = np.asarray(spmm_onehot(g.fwd, g.bwd, x, True))
    np.testing.assert_allclose(got, m.toarray() @ np.asarray(x), rtol=RTOL, atol=ATOL)
