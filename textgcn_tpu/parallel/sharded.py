"""Multi-chip GCN execution over a 1-D ``jax.sharding.Mesh``.

New TPU-native capability (the reference is single-device; SURVEY.md §5
"distributed communication backend: none"). Strategy:

- nodes (and therefore feature/activation rows and adjacency rows) are
  sharded over the mesh axis ``"nodes"``;
- dense feature transforms (``x @ W``) run locally on each shard (weights
  replicated, rows sharded — no communication);
- sparse aggregation :func:`spmm_sharded` runs under ``shard_map``:
  an ``all_gather`` of the feature rows over ICI followed by a local
  segment-sum over the shard's edges. XLA overlaps the gather with local
  compute where profitable. (Edge-bucketed halo exchange via ``ppermute``
  is the planned refinement for graphs whose features don't fit a gather.)
- the loss is a masked cross-entropy computed on each shard's local rows and
  ``psum``-reduced; gradient AD through ``shard_map`` inserts the matching
  collectives automatically (replicated params get psum'd cotangents).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from textgcn_tpu.parallel.partition import PartitionedGraph

AXIS = "nodes"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh({n}) needs {n} devices but only {len(devs)} are "
            f"visible ({devs}); set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} "
            f"JAX_PLATFORMS=cpu (or jax.config.update('jax_platforms','cpu') "
            f"if a sitecustomize pins the platform) for a virtual mesh."
        )
    return Mesh(np.asarray(devs[:n]), (axis,))


def _local_spmm(row, col, val, x_local, *, rows_per_shard, axis):
    """Per-shard body: gather all feature rows, aggregate local rows."""
    x_full = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
    xp = jnp.concatenate(
        [x_full, jnp.zeros((1, x_full.shape[1]), dtype=x_full.dtype)], axis=0
    )
    gathered = xp[col] * val[:, None].astype(x_full.dtype)
    out = jax.ops.segment_sum(
        gathered, row, num_segments=rows_per_shard + 1,
        indices_are_sorted=True,
    )
    return out[:rows_per_shard]


def spmm_sharded(pg: PartitionedGraph, x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Â @ x with row-sharded Â and x. x: [n_pad, F] sharded on rows."""
    fn = partial(
        _local_spmm, rows_per_shard=pg.rows_per_shard, axis=AXIS
    )

    def body(row, col, val, x_local):
        return fn(row[0], col[0], val[0], x_local)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS, None)),
        out_specs=P(AXIS, None),
    )(pg.row, pg.col, pg.val, x)


def sharded_gcn_forward(
    params,
    pg,
    x: Optional[jnp.ndarray],
    mesh: Mesh,
    *,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Row-sharded logits [n_pad, C].

    ``pg`` may be a :class:`PartitionedGraph` (all-gather aggregation,
    O(N·F) per-chip memory) or a
    :class:`textgcn_tpu.parallel.halo.HaloPartitionedGraph` (ring halo
    exchange, O(N/P·F) memory) — the aggregation dispatches on type.

    ``x=None`` selects identity features (classic TextGCN doc-word
    graphs): layer 1's support ``I @ W1`` IS ``W1``, so ``gc1.w`` must be
    a **row-sharded [n_pad, H]** table (node rows, same P("nodes", None)
    layout as features) rather than a replicated [F, H] weight — the
    embedding-table formulation of models/gcn.py:76-77 carried onto the
    mesh, with tensor-parallel-style sharded parameter gradients falling
    out of shard_map AD for free.
    """
    from textgcn_tpu.parallel.halo import HaloPartitionedGraph, spmm_halo

    agg = (
        (lambda s: spmm_halo(pg, s, mesh))
        if isinstance(pg, HaloPartitionedGraph)
        else (lambda s: spmm_sharded(pg, s, mesh))
    )
    if x is None:
        support = params["gc1"]["w"]
    else:
        support = jnp.dot(
            x, params["gc1"]["w"], preferred_element_type=jnp.float32
        )
    h = agg(support) + params["gc1"]["b"]
    h = jax.nn.relu(h)
    if train and dropout > 0.0:
        keep = 1.0 - dropout
        mask = jax.random.bernoulli(rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    support2 = jnp.dot(h, params["gc2"]["w"], preferred_element_type=jnp.float32)
    return agg(support2) + params["gc2"]["b"]


def make_sharded_train_step(
    pg: PartitionedGraph,
    mesh: Mesh,
    optimizer,
    *,
    dropout: float = 0.5,
):
    """Compiled full-batch train step over the mesh.

    The loss is CE over labeled train nodes: each shard's rows carry a
    weight mask (1 for train nodes, 0 otherwise); per-shard weighted sums
    are psum'd so the loss equals the global masked mean.
    """

    def loss_fn(params, x, y, w, rng):
        logits = sharded_gcn_forward(
            params, pg, x, mesh, dropout=dropout, train=True, rng=rng
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        num = jnp.sum(nll * w)
        den = jnp.sum(w)
        return num / den

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, x, y, w, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, w, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        return params, opt_state, loss

    return train_step


def shard_arrays(
    mesh: Mesh, x: np.ndarray, y: np.ndarray, w: np.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Place padded host arrays with row sharding on the mesh."""
    sx = NamedSharding(mesh, P(AXIS, None))
    sv = NamedSharding(mesh, P(AXIS))
    return (
        jax.device_put(x, sx),
        jax.device_put(y, sv),
        jax.device_put(w, sv),
    )
