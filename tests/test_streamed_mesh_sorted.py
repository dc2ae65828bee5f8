"""SORTED (plan-layout) streaming on the mesh
(textgcn_tpu/parallel/streamed.py round-5 additions): the one-hot-reduce
chunk body composed with the ppermute ring, the host-fed (on-disk) bucket
source, and the sharded segmented train step driven by the sorted ring.
Virtual 8-device CPU mesh; Pallas in interpret mode."""
import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from textgcn_tpu.graph.structs import SparseGraph
from textgcn_tpu.parallel.halo import partition_rows_halo
from textgcn_tpu.parallel.sharded import make_mesh
from textgcn_tpu.parallel.streamed import (
    halo_sorted_bucket_stream,
    mesh_sorted_chunks_from_dir,
    save_halo_sorted_buckets,
    spmm_streamed_mesh_sorted,
    spmm_streamed_mesh_sorted_hostfed,
    spmm_streamed_mesh_sorted_multi,
)

P_SHARDS = 4
W = 8
K = 128


def _sym_graph(n=64, e=400, seed=3):
    rng = np.random.RandomState(seed)
    row = rng.randint(0, n, e)
    col = rng.randint(0, n, e)
    val = rng.rand(e)
    r2 = np.concatenate([row, col])
    c2 = np.concatenate([col, row])
    v2 = np.concatenate([val, val])
    g = SparseGraph.from_coo(r2, c2, v2, n, pad_to_multiple=8)
    hg = partition_rows_halo(g, P_SHARDS, pad_edges_to_multiple=8)
    a = sp.coo_matrix((v2, (r2, c2)), shape=(hg.n_pad, hg.n_pad)).tocsr()
    return hg, a


def test_mesh_sorted_matches_dense_real_graph():
    hg, a = _sym_graph()
    mesh = make_mesh(P_SHARDS)
    edge_fn, n_chunks, spec, edge_args = halo_sorted_bucket_stream(
        hg, k=K, w=W
    )
    dims = (hg.rows_per_shard, P_SHARDS, n_chunks)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(hg.n_pad, 128), jnp.float32)
    xs = jax.device_put(
        x,
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("nodes", None)
        ),
    )
    got = spmm_streamed_mesh_sorted(
        edge_fn, xs, mesh, dims, spec, edge_args, True
    )
    want = a @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    got_multi = spmm_streamed_mesh_sorted_multi(
        edge_fn, xs, mesh, dims, spec, edge_args, chunks_per_dispatch=1,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_multi), want, rtol=1e-5, atol=1e-5
    )


def test_mesh_sorted_grad_matches_dense():
    hg, a = _sym_graph(seed=7)
    mesh = make_mesh(P_SHARDS)
    edge_fn, n_chunks, spec, edge_args = halo_sorted_bucket_stream(
        hg, k=K, w=W
    )
    dims = (hg.rows_per_shard, P_SHARDS, n_chunks)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(hg.n_pad, 128), jnp.float32)
    t = jnp.asarray(rng.randn(hg.n_pad, 128), jnp.float32)
    ad = jnp.asarray(a.toarray())

    def f_mesh(v):
        return jnp.sum(
            spmm_streamed_mesh_sorted(
                edge_fn, v, mesh, dims, spec, edge_args, True
            )
            * t
        )

    def f_dense(v):
        return jnp.sum((ad @ v) * t)

    g_mesh = jax.grad(f_mesh)(x)
    g_dense = jax.grad(f_dense)(x)
    np.testing.assert_allclose(
        np.asarray(g_mesh), np.asarray(g_dense), rtol=1e-4, atol=1e-4
    )


def test_mesh_sorted_hostfed_from_disk(tmp_path):
    """A real graph's sorted buckets written to DISK train-path through
    the ring: the host-fed x mesh composition (round-4 missing #2)."""
    hg, a = _sym_graph(seed=9)
    mesh = make_mesh(P_SHARDS)
    d = str(tmp_path / "buckets")
    save_halo_sorted_buckets(hg, d, k=K, w=W)
    chunk_source, spec, n_chunks, n_shards, rps = (
        mesh_sorted_chunks_from_dir(d)
    )
    assert (n_shards, rps) == (P_SHARDS, hg.rows_per_shard)
    dims = (rps, n_shards, n_chunks)
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(hg.n_pad, 128), jnp.float32)
    xs = jax.device_put(
        x,
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("nodes", None)
        ),
    )
    got = spmm_streamed_mesh_sorted_hostfed(
        chunk_source, xs, mesh, dims, spec, interpret=True
    )
    want = a @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_sharded_segmented_train_step_on_sorted_ring():
    """The sharded segmented GCN train step driven by the SORTED mesh
    ring (stream_fn hook) == the dense-operator autodiff oracle (f32)."""
    import optax

    from textgcn_tpu.train.streamed import (
        init_streamed,
        make_streamed_train_step_segmented,
    )

    hg, a = _sym_graph(seed=11)
    mesh = make_mesh(P_SHARDS)
    edge_fn, n_chunks, spec, edge_args = halo_sorted_bucket_stream(
        hg, k=K, w=W
    )
    dims = (hg.rows_per_shard, P_SHARDS, n_chunks)
    n_pad = hg.n_pad
    rng = np.random.RandomState(12)
    f, h, c = 128, 6, 3
    x = jnp.asarray(rng.randn(n_pad, f), jnp.float32)
    y = jnp.asarray(rng.randint(0, c, n_pad), jnp.int32)
    mask = jnp.asarray((rng.rand(n_pad) < 0.5), jnp.float32)
    sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("nodes", None)
    )
    sv = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("nodes")
    )
    xs = jax.device_put(x, sh)
    ys = jax.device_put(y, sv)
    ms = jax.device_put(mask, sv)
    params, opt, opt_state = init_streamed(jax.random.PRNGKey(0), f, h, c)

    def stream_fn(v):
        return spmm_streamed_mesh_sorted_multi(
            edge_fn, v, mesh, dims, spec, edge_args,
            chunks_per_dispatch=1, interpret=True,
        )

    step = make_streamed_train_step_segmented(
        None, n_pad, n_chunks, stream_dtype=jnp.float32,
        stream_fn=stream_fn,
    )
    p2, _, loss = step(dict(params), opt_state, xs, ys, ms)

    ad = jnp.asarray(a.toarray())

    def dense_loss(p):
        s1 = jnp.dot(x, p["gc1"]["w"])
        hh = jax.nn.relu(ad @ s1 + p["gc1"]["b"])
        logits = ad @ jnp.dot(hh, p["gc2"]["w"]) + p["gc2"]["b"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        return jnp.sum(nll * mask) / jnp.sum(mask)

    params_d, _, opt_state_d = init_streamed(jax.random.PRNGKey(0), f, h, c)
    loss_d, grads = jax.value_and_grad(dense_loss)(params_d)
    np.testing.assert_allclose(float(loss), float(loss_d), rtol=2e-4)
    upd, _ = opt.update(grads, opt_state_d, params_d)
    want = optax.apply_updates(params_d, upd)
    np.testing.assert_allclose(
        np.asarray(p2["gc2"]["w"]), np.asarray(want["gc2"]["w"]),
        rtol=2e-3, atol=2e-4,
    )
