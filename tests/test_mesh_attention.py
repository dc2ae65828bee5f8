"""Sharded fused Pallas attention (parallel/mesh_attention.py — round-4
verdict weak #2, sharded half): per-shard rectangular plans under
shard_map, oracle-checked against the segment-softmax GAT math and the
segment-kernel ShardedTrainer on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from textgcn_tpu.graph.structs import SparseGraph
from textgcn_tpu.models.gat import segment_softmax
from textgcn_tpu.parallel.mesh_attention import (
    MeshAttentionAllGather,
    mesh_gat_attention,
)
from textgcn_tpu.parallel.partition import pad_features
from textgcn_tpu.parallel.sharded import AXIS, make_mesh
from textgcn_tpu.parallel.trainer import ShardedTrainer
from textgcn_tpu.train.trainer import TrainConfig


def _graph(n=100, m=600, seed=0, skew=False):
    rng = np.random.RandomState(seed)
    if skew:
        # power-law-ish rows: exercises the per-shard chunk-count padding
        # (_pad_attention_graph) — some shards get many chunks, some few
        row = (n * rng.power(3.0, m)).astype(np.int64) % n
    else:
        row = rng.randint(0, n, m)
    col = rng.randint(0, n, m)
    val = (rng.rand(m) + 0.1).astype(np.float64)
    return SparseGraph.from_coo(row, col, val, n)


def _oracle_attention(g, a_s, a_d, h, slope=0.2):
    e = g.n_edges
    gr = np.asarray(g.row)[:e]
    gc = np.asarray(g.col)[:e]
    gv = np.asarray(g.val)[:e]
    es = h @ a_s
    ed = h @ a_d
    lo = jax.nn.leaky_relu(jnp.asarray(es[gr] + ed[gc]), slope)
    lo = lo + jnp.log(jnp.asarray(gv))
    att = segment_softmax(lo, jnp.asarray(gr), g.n_nodes)
    return jax.ops.segment_sum(
        jnp.asarray(h)[gc] * att[:, None],
        jnp.asarray(gr),
        num_segments=g.n_nodes,
    )


def _setup(seed=0, n=100, m=600, f=12, skew=False):
    g = _graph(n, m, seed, skew=skew)
    mg = MeshAttentionAllGather.from_graph(g, 8, w=8, k=128)
    mesh = make_mesh(8)
    rng = np.random.RandomState(seed + 1)
    h = rng.randn(n, f).astype(np.float32)
    a_s = rng.randn(f).astype(np.float32)
    a_d = rng.randn(f).astype(np.float32)
    hs = jax.device_put(
        pad_features(h, mg.n_pad), NamedSharding(mesh, P(AXIS, None))
    )
    return g, mg, mesh, h, a_s, a_d, hs


def test_mesh_attention_forward_matches_oracle():
    g, mg, mesh, h, a_s, a_d, hs = _setup()
    out = jax.jit(
        lambda m_, s, d, x: mesh_gat_attention(
            m_, s, d, x, mesh, interpret=True
        )
    )(mg, a_s, a_d, hs)
    ref = np.asarray(_oracle_attention(g, a_s, a_d, h))
    got = np.asarray(out)[: g.n_nodes]
    # bf16 aggregation bounds the error (same tolerance family as the
    # single-chip kernel tests)
    assert np.max(np.abs(got - ref)) <= 3e-2 * max(np.max(np.abs(ref)), 1.0)


def test_mesh_attention_skewed_shards_padding():
    """Skewed row distribution → different per-shard chunk counts → the
    phantom-chunk padding path must still match the oracle."""
    g, mg, mesh, h, a_s, a_d, hs = _setup(seed=3, skew=True)
    out = jax.jit(
        lambda m_, s, d, x: mesh_gat_attention(
            m_, s, d, x, mesh, interpret=True
        )
    )(mg, a_s, a_d, hs)
    ref = np.asarray(_oracle_attention(g, a_s, a_d, h))
    got = np.asarray(out)[: g.n_nodes]
    assert np.max(np.abs(got - ref)) <= 3e-2 * max(np.max(np.abs(ref)), 1.0)


def test_mesh_attention_grads_match_oracle():
    g, mg, mesh, h, a_s, a_d, hs = _setup(seed=7)
    n = g.n_nodes
    e = g.n_edges
    gr = jnp.asarray(np.asarray(g.row)[:e])
    gc = jnp.asarray(np.asarray(g.col)[:e])
    gv = jnp.asarray(np.asarray(g.val)[:e])

    @jax.jit
    def grads_mesh(a_s, a_d, hh):
        def loss(a_s, a_d, hh):
            o = mesh_gat_attention(mg, a_s, a_d, hh, mesh, interpret=True)
            return jnp.sum(o[:n] ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(a_s, a_d, hh)

    def loss_ref(a_s, a_d, hh):
        es = hh @ a_s
        ed = hh @ a_d
        lo = jax.nn.leaky_relu(es[gr] + ed[gc], 0.2) + jnp.log(gv)
        att = segment_softmax(lo, gr, n)
        o = jax.ops.segment_sum(hh[gc] * att[:, None], gr, num_segments=n)
        return jnp.sum(o ** 2)

    gm = grads_mesh(jnp.asarray(a_s), jnp.asarray(a_d), hs)
    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(a_s), jnp.asarray(a_d), jnp.asarray(h)
    )
    pairs = [
        ("a_src", np.asarray(gm[0]), np.asarray(gref[0])),
        ("a_dst", np.asarray(gm[1]), np.asarray(gref[1])),
        ("h", np.asarray(gm[2])[:n], np.asarray(gref[2])),
    ]
    for name, got, ref in pairs:
        tol = 3e-2 * max(np.max(np.abs(ref)), 1.0)
        assert np.max(np.abs(got - ref)) <= tol, name


def test_sharded_gat_onehot_trains_like_segment():
    """ShardedTrainer(model=gat, kernel=onehot) follows the segment-kernel
    trainer's loss trajectory epoch-for-epoch within kernel drift."""
    rng = np.random.RandomState(11)
    n, m, C = 120, 700, 4
    g = _graph(n, m, seed=11)
    feats = rng.randn(n, 10).astype(np.float32)
    y = rng.randint(0, C, n)
    tr_idx = np.arange(0, 60)
    te_idx = np.arange(60, 110)
    cfg = TrainConfig(
        model="gat", max_epoch=6, epoch_block=3, seed=0, early_stopping=50
    )
    losses = {}
    for kern in ("segment", "onehot"):
        t = ShardedTrainer(
            g, feats, y, tr_idx, te_idx, C,
            config=cfg, partition="allgather", kernel=kern,
        )
        t.fit(verbose=False)
        losses[kern] = [h["train_loss"] for h in t.history]
    assert len(losses["segment"]) == len(losses["onehot"])
    for a, b in zip(losses["segment"], losses["onehot"]):
        assert abs(a - b) < 3e-2


def test_gat_onehot_requires_allgather():
    g = _graph(64, 300, seed=1)
    import pytest

    cfg = TrainConfig(model="gat")
    with pytest.raises(ValueError, match="allgather"):
        ShardedTrainer(
            g, np.zeros((64, 4), np.float32), np.zeros(64, np.int64),
            np.arange(10), np.arange(10, 20), 2,
            config=cfg, partition="halo", kernel="onehot",
        )
