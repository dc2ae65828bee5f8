"""Oracles for the sorted (plan-layout) streamed SpMM
(textgcn_tpu/ops/streamed_sorted.py) — round-4 verdict weak #1.

Pallas runs in interpret mode on the CPU test backend (same numerics)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from textgcn_tpu.ops.pallas_onehot import build_onehot_plan
from textgcn_tpu.ops.streamed_sorted import (
    SortedStreamSpec,
    lattice_to_coo,
    make_lattice_edge_fn,
    padded_rows_for_plan,
    plan_stream,
    save_plan_chunks,
    sorted_chunks_from_dir,
    spmm_streamed_sorted,
    spmm_streamed_sorted_hostfed,
    spmm_streamed_sorted_multi,
    spmm_streamed_sorted_sym,
)

N_CHUNKS, W_SC, W, CELL_E, K = 5, 2, 8, 64, 128


def _lattice():
    edge_fn, spec = make_lattice_edge_fn(
        N_CHUNKS, W_SC, W, CELL_E, K, seed=3
    )
    n_pad = N_CHUNKS * spec.rows_per_chunk
    return edge_fn, spec, n_pad


def _lattice_matrix(edge_fn, spec, n_pad):
    r, c, v = lattice_to_coo(edge_fn, N_CHUNKS, spec)
    return sp.coo_matrix((v, (r, c)), shape=(n_pad, n_pad)).tocsr()


def test_lattice_stream_is_symmetric():
    edge_fn, spec, n_pad = _lattice()
    a = _lattice_matrix(edge_fn, spec, n_pad)
    diff = a - a.T
    assert abs(diff).max() < 1e-6


def test_sorted_stream_matches_scipy():
    edge_fn, spec, n_pad = _lattice()
    a = _lattice_matrix(edge_fn, spec, n_pad)
    x = np.random.default_rng(0).normal(size=(n_pad, 10)).astype(np.float32)
    want = a @ x
    got = spmm_streamed_sorted(
        edge_fn, jnp.asarray(x), N_CHUNKS, spec, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_sorted_multi_matches_monolithic():
    edge_fn, spec, n_pad = _lattice()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_pad, 7)).astype(np.float32)
    )
    mono = spmm_streamed_sorted(edge_fn, x, N_CHUNKS, spec, interpret=True)
    multi = spmm_streamed_sorted_multi(
        edge_fn, x, N_CHUNKS, spec, chunks_per_dispatch=2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(mono), np.asarray(multi)[:, :7], rtol=1e-6, atol=1e-6
    )


def test_sorted_sym_grad_matches_dense():
    edge_fn, spec, n_pad = _lattice()
    a = jnp.asarray(_lattice_matrix(edge_fn, spec, n_pad).toarray())
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(n_pad, 6)).astype(np.float32)
    )
    t = jnp.asarray(
        np.random.default_rng(3).normal(size=(n_pad, 6)).astype(np.float32)
    )

    def loss_stream(xx):
        return jnp.sum(
            spmm_streamed_sorted_sym(edge_fn, xx, N_CHUNKS, spec, True) * t
        )

    def loss_dense(xx):
        return jnp.sum((a @ xx) * t)

    g_stream = jax.grad(loss_stream)(x)
    g_dense = jax.grad(loss_dense)(x)
    np.testing.assert_allclose(
        np.asarray(g_stream), np.asarray(g_dense), rtol=2e-4, atol=2e-4
    )


def _random_coo(n, e, seed):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e).astype(np.int64)
    col = rng.integers(0, n, e).astype(np.int64)
    val = rng.random(e).astype(np.float64)
    return row, col, val


def test_plan_stream_matches_scipy():
    n, e = 300, 4000
    row, col, val = _random_coo(n, e, 4)
    # small max_p_bytes forces several superchunks = several stream chunks
    plan = build_onehot_plan(
        row, col, val, n, k=128, w=8, max_p_bytes=64 * 128 * 4, f_hint=16
    )
    assert plan.n_sc > 1
    edge_fn, n_chunks, spec = plan_stream(plan)
    n_pad = padded_rows_for_plan(plan)
    x = np.random.default_rng(5).normal(size=(n, 16)).astype(np.float32)
    xp = np.zeros((n_pad, 16), np.float32)
    xp[:n] = x
    got = spmm_streamed_sorted(
        edge_fn, jnp.asarray(xp), n_chunks, spec, interpret=True
    )
    want = sp.coo_matrix((val, (row, col)), shape=(n, n)).tocsr() @ x
    np.testing.assert_allclose(
        np.asarray(got)[:n], want, rtol=2e-5, atol=2e-5
    )


def test_hostfed_sorted_matches_resident(tmp_path):
    n, e = 200, 3000
    row, col, val = _random_coo(n, e, 6)
    plan = build_onehot_plan(
        row, col, val, n, k=128, w=8, max_p_bytes=64 * 128 * 4, f_hint=16
    )
    edge_fn, n_chunks, spec = plan_stream(plan)
    n_pad = padded_rows_for_plan(plan)
    x = np.random.default_rng(7).normal(size=(n_pad, 16)).astype(np.float32)
    resident = spmm_streamed_sorted(
        edge_fn, jnp.asarray(x), n_chunks, spec, interpret=True
    )
    d = str(tmp_path / "chunks")
    save_plan_chunks(plan, d)
    chunks, spec2, n2, n_nodes = sorted_chunks_from_dir(d)
    assert (spec2, n2, n_nodes) == (spec, n_chunks, n)
    hostfed = spmm_streamed_sorted_hostfed(
        chunks, jnp.asarray(x), spec2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(resident), np.asarray(hostfed), rtol=1e-6, atol=1e-6
    )
    # re-iterable: a second pass (the backward's replay) works
    hostfed2 = spmm_streamed_sorted_hostfed(
        chunks, jnp.asarray(x), spec2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(hostfed), np.asarray(hostfed2), rtol=0, atol=0
    )


def test_segmented_gcn_train_step_on_sorted_stream():
    """The segmented GCN train step driven by the SORTED stream (its
    stream_fn hook) == the dense-operator autodiff oracle, f32 exact
    path — the round-5 streamed-kernel upgrade composes with training."""
    import jax
    import optax

    from textgcn_tpu.train.streamed import (
        init_streamed,
        make_streamed_train_step_segmented,
    )

    edge_fn, spec, n_pad = _lattice()
    a = jnp.asarray(_lattice_matrix(edge_fn, spec, n_pad).toarray())
    rng = np.random.default_rng(8)
    f, h, c = 12, 6, 3
    x = jnp.asarray(rng.normal(size=(n_pad, f)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n_pad).astype(np.int32))
    mask = jnp.asarray((rng.random(n_pad) < 0.5).astype(np.float32))
    params, opt, opt_state = init_streamed(jax.random.PRNGKey(0), f, h, c)

    def stream_fn(v):
        return spmm_streamed_sorted_multi(
            edge_fn, v, N_CHUNKS, spec, chunks_per_dispatch=2,
            interpret=True,
        )[:, : v.shape[1]]

    step = make_streamed_train_step_segmented(
        None, n_pad, N_CHUNKS, stream_dtype=jnp.float32,
        stream_fn=stream_fn,
    )
    p2, _, loss = step(
        dict(params), opt_state, x, y, mask
    )

    def dense_loss(p):
        s1 = jnp.dot(x, p["gc1"]["w"])
        a1 = a @ s1
        hh = jax.nn.relu(a1 + p["gc1"]["b"])
        s2 = jnp.dot(hh, p["gc2"]["w"])
        logits = a @ s2 + p["gc2"]["b"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        return jnp.sum(nll * mask) / jnp.sum(mask)

    params_d, opt_state_d = init_streamed(jax.random.PRNGKey(0), f, h, c)[
        0
    ], opt.init(params)
    loss_d, grads = jax.value_and_grad(dense_loss)(params_d)
    np.testing.assert_allclose(float(loss), float(loss_d), rtol=2e-4)
    upd, _ = opt.update(grads, opt_state_d, params_d)
    want = optax.apply_updates(params_d, upd)
    for k in ("gc1", "gc2"):
        np.testing.assert_allclose(
            np.asarray(p2[k]["w"]), np.asarray(want[k]["w"]),
            rtol=2e-3, atol=2e-4,
        )


def test_cached_chunk_source_reuses_device_chunks(tmp_path):
    """CachedChunkSource: passes after the first serve pinned chunks from
    device memory — the host source is read once, not once per pass
    (round-4 stretch #9)."""
    from textgcn_tpu.ops.streamed_sorted import (
        CachedChunkSource,
        chunk_loader_from_dir,
    )

    n, e = 200, 3000
    row, col, val = _random_coo(n, e, 16)
    plan = build_onehot_plan(
        row, col, val, n, k=128, w=8, max_p_bytes=64 * 128 * 4, f_hint=16
    )
    d = str(tmp_path / "chunks")
    save_plan_chunks(plan, d)
    _, spec, n_chunks, _ = sorted_chunks_from_dir(d)
    assert n_chunks > 1
    n_pad = padded_rows_for_plan(plan)
    x = jnp.asarray(
        np.random.default_rng(17).normal(size=(n_pad, 16)).astype(
            np.float32
        )
    )
    src = CachedChunkSource(
        chunk_loader_from_dir(d), n_chunks, cache_bytes=1 << 30
    )
    out1 = spmm_streamed_sorted_hostfed(src, x, spec, interpret=True)
    assert src.host_loads == n_chunks
    out2 = spmm_streamed_sorted_hostfed(src, x, spec, interpret=True)
    assert src.host_loads == n_chunks  # second pass: zero host reads
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=0, atol=0
    )
    # zero budget: every pass re-reads everything (honest fallback)
    src0 = CachedChunkSource(
        chunk_loader_from_dir(d), n_chunks, cache_bytes=0
    )
    spmm_streamed_sorted_hostfed(src0, x, spec, interpret=True)
    spmm_streamed_sorted_hostfed(src0, x, spec, interpret=True)
    assert src0.host_loads == 2 * n_chunks
    out3 = spmm_streamed_sorted_hostfed(src0, x, spec, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out3), rtol=1e-6, atol=1e-6
    )
