"""Pallas kernels on the device mesh: shard-local aggregation through the
one-hot MXU segment-reduce (:mod:`textgcn_tpu.ops.pallas_onehot`) instead of
XLA gather+segment-sum.

Round-2 verdict, item #1: the single-chip story (hybrid/one-hot kernels,
8.1x over segment-sum) stopped at the mesh boundary — shard-local
aggregation in both mesh layouts was still the ~6%-of-roofline XLA
scatter path. This module closes that: each shard's edge set (or each
(owner, source) ring bucket) is planned host-side into the SAME padded
one-hot layout the single-chip kernel consumes, stacked across shards with
uniform static shapes, and executed inside ``shard_map`` — ppermute/
all_gather move the feature blocks over ICI, the Pallas kernel does the
aggregation on the MXU.

Two layouts, mirroring :mod:`textgcn_tpu.parallel.sharded` / ``halo``:

- :class:`MeshOneHotAllGather` — one plan per owner shard over ALL its
  edges (cols global); device fn all-gathers the feature rows then runs one
  local kernel pass. O(N·F) per-chip memory, one collective.
- :class:`MeshOneHotHalo` — one plan per (owner p, source q) bucket with
  LOCAL col ids; feature blocks rotate around the ``ppermute`` ring and
  each step's bucket is kernel-reduced into the resident accumulator.
  O(N/P·F) per-chip memory — the scaling path.

Both are differentiable in ``x`` via a symmetric custom VJP (Âᵀ = Â for
sym-normalized adjacencies: the cotangent is the SAME mesh operator applied
to ``g``), mirroring :func:`textgcn_tpu.ops.spmm.spmm_coo_segment`.

No reference counterpart: the reference is single-device ``torch.spmm``
(reference layer.py:102,106) with zero distributed code (SURVEY.md §2).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from textgcn_tpu.graph.structs import SparseGraph
from textgcn_tpu.ops.pallas_onehot import (
    OneHotPlan,
    _spmm_onehot_impl,
    build_onehot_plan,
)

AXIS = "nodes"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_plan_chunks(plan: OneHotPlan, c_sc: int) -> OneHotPlan:
    """Pad a single-superchunk plan to ``c_sc`` chunks with phantoms.

    Phantom chunks follow the planner's own convention
    (ops/pallas_onehot.py build_onehot_plan): col=0 + val=0 gathers nothing,
    lrow=w lands in the all-zero one-hot column, wloc repeats the last real
    window so the kernel accumulates zeros without re-zeroing the output.
    """
    assert plan.n_sc == 1 and c_sc >= plan.c_sc
    extra = c_sc - plan.c_sc
    if extra == 0:
        return plan
    k, w = plan.k, plan.w
    col = jnp.concatenate(
        [plan.col, jnp.zeros((1, extra * k), dtype=plan.col.dtype)], axis=1
    )
    val = jnp.concatenate(
        [plan.val, jnp.zeros((1, extra * k), dtype=plan.val.dtype)], axis=1
    )
    lrow = jnp.concatenate(
        [plan.lrow, jnp.full((1, extra, k), w, dtype=plan.lrow.dtype)], axis=1
    )
    wloc = jnp.concatenate(
        [plan.wloc, jnp.repeat(plan.wloc[:, -1:], extra, axis=1)], axis=1
    )
    return dataclasses.replace(
        plan, col=col, val=val, lrow=lrow, wloc=wloc, c_sc=int(c_sc)
    )


def _shard_geometry(n_nodes: int, n_shards: int) -> Tuple[int, int]:
    """(rows_per_shard, n_pad) — identical to parallel.partition/halo so
    features, masks, and checkpoints are layout-compatible across mesh
    aggregation strategies."""
    rps = _round_up(max(1, -(-n_nodes // n_shards)), 8)
    return rps, rps * n_shards


def _coo_of(g: SparseGraph):
    e = g.n_edges
    return (
        np.asarray(g.row)[:e].astype(np.int64),
        np.asarray(g.col)[:e].astype(np.int64),
        np.asarray(g.val)[:e].astype(np.float64),
    )


def _plan_kw(rps: int, k: int, w: int) -> Tuple[int, int]:
    """Clamp the chunk/window sizes to the shard-local row count (tiny
    test meshes) while keeping the kernel's alignment contracts
    (k % 128 == 0, w % 8 == 0)."""
    w = min(w, _round_up(rps, 8))
    return max(128, k - k % 128), max(8, w - w % 8)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["col", "val", "lrow", "wloc"],
    meta_fields=[
        "n_nodes", "n_edges", "n_pad", "rows_per_shard", "n_shards",
        "k", "w", "w_sc", "c_sc", "symmetric",
    ],
)
@dataclasses.dataclass(frozen=True)
class MeshOneHotAllGather:
    """Per-owner-shard one-hot plans, stacked (leading dim = shard).

    col holds GLOBAL column ids (the device fn gathers from the
    all-gathered [n_pad, F] feature matrix); rows are local to the owner.
    """

    col: jnp.ndarray  # [P, c_sc*k] int32
    val: jnp.ndarray  # [P, c_sc*k] float32
    lrow: jnp.ndarray  # [P, c_sc, k] int32
    wloc: jnp.ndarray  # [P, c_sc] int32
    n_nodes: int
    n_edges: int
    n_pad: int
    rows_per_shard: int
    n_shards: int
    k: int
    w: int
    w_sc: int
    c_sc: int
    symmetric: bool

    @staticmethod
    def from_graph(
        g: SparseGraph,
        n_shards: int,
        k: int = 512,
        w: int = 256,
        symmetric: bool = True,
    ) -> "MeshOneHotAllGather":
        row, col, val = _coo_of(g)
        rps, n_pad = _shard_geometry(g.n_nodes, n_shards)
        k, w = _plan_kw(rps, k, w)
        plans = []
        for p in range(n_shards):
            sel = row // rps == p
            plans.append(
                build_onehot_plan(
                    row[sel] - p * rps,
                    col[sel],
                    val[sel],
                    rps,
                    k=k,
                    w=w,
                    max_p_bytes=1 << 62,  # force n_sc == 1 (uniform stacking)
                )
            )
        c_sc = max(pl.c_sc for pl in plans)
        plans = [_pad_plan_chunks(pl, c_sc) for pl in plans]
        return MeshOneHotAllGather(
            col=jnp.stack([pl.col[0] for pl in plans]),
            val=jnp.stack([pl.val[0] for pl in plans]),
            lrow=jnp.stack([pl.lrow[0] for pl in plans]),
            wloc=jnp.stack([pl.wloc[0] for pl in plans]),
            n_nodes=g.n_nodes,
            n_edges=g.n_edges,
            n_pad=int(n_pad),
            rows_per_shard=int(rps),
            n_shards=int(n_shards),
            k=int(k),
            w=int(w),
            w_sc=int(plans[0].w_sc),
            c_sc=int(c_sc),
            symmetric=bool(symmetric),
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["col", "val", "lrow", "wloc"],
    meta_fields=[
        "n_nodes", "n_edges", "n_pad", "rows_per_shard", "n_shards",
        "k", "w", "w_sc", "c_sc", "symmetric",
    ],
)
@dataclasses.dataclass(frozen=True)
class MeshOneHotHalo:
    """Per-(owner p, source q) bucket plans, stacked [P, P, ...].

    Bucket (p, q) holds p's edges whose column lives on q, with LOCAL row
    and col ids; the device fn reduces the (p, q) bucket at the ring step
    where p holds q's feature block.
    """

    col: jnp.ndarray  # [P, P, c_sc*k] int32 (local to source shard)
    val: jnp.ndarray  # [P, P, c_sc*k] float32
    lrow: jnp.ndarray  # [P, P, c_sc, k] int32 (local to owner shard)
    wloc: jnp.ndarray  # [P, P, c_sc] int32
    n_nodes: int
    n_edges: int
    n_pad: int
    rows_per_shard: int
    n_shards: int
    k: int
    w: int
    w_sc: int
    c_sc: int
    symmetric: bool

    @staticmethod
    def from_graph(
        g: SparseGraph,
        n_shards: int,
        k: int = 512,
        w: int = 256,
        symmetric: bool = True,
    ) -> "MeshOneHotHalo":
        row, col, val = _coo_of(g)
        rps, n_pad = _shard_geometry(g.n_nodes, n_shards)
        k, w = _plan_kw(rps, k, w)
        p_of = row // rps
        q_of = col // rps
        plans = []
        for p in range(n_shards):
            prow = []
            for q in range(n_shards):
                sel = (p_of == p) & (q_of == q)
                prow.append(
                    build_onehot_plan(
                        row[sel] - p * rps,
                        col[sel] - q * rps,
                        val[sel],
                        rps,
                        k=k,
                        w=w,
                        max_p_bytes=1 << 62,
                    )
                )
            plans.append(prow)
        c_sc = max(pl.c_sc for prow in plans for pl in prow)
        plans = [[_pad_plan_chunks(pl, c_sc) for pl in prow] for prow in plans]
        return MeshOneHotHalo(
            col=jnp.stack(
                [jnp.stack([pl.col[0] for pl in prow]) for prow in plans]
            ),
            val=jnp.stack(
                [jnp.stack([pl.val[0] for pl in prow]) for prow in plans]
            ),
            lrow=jnp.stack(
                [jnp.stack([pl.lrow[0] for pl in prow]) for prow in plans]
            ),
            wloc=jnp.stack(
                [jnp.stack([pl.wloc[0] for pl in prow]) for prow in plans]
            ),
            n_nodes=g.n_nodes,
            n_edges=g.n_edges,
            n_pad=int(n_pad),
            rows_per_shard=int(rps),
            n_shards=int(n_shards),
            k=int(k),
            w=int(w),
            w_sc=int(plans[0][0].w_sc),
            c_sc=int(c_sc),
            symmetric=bool(symmetric),
        )


def _local_plan(mg, col, val, lrow, wloc) -> OneHotPlan:
    """Wrap device-local (possibly dynamically indexed) plan slices back
    into the OneHotPlan pytree the single-chip kernel impl consumes."""
    return OneHotPlan(
        col=col[None],
        val=val[None],
        lrow=lrow[None],
        wloc=wloc[None],
        n_nodes=mg.rows_per_shard,
        n_edges=mg.n_edges,
        k=mg.k,
        w=mg.w,
        w_sc=mg.w_sc,
        n_sc=1,
        c_sc=mg.c_sc,
    )


def _allgather_impl(
    mg: MeshOneHotAllGather, x: jnp.ndarray, mesh: Mesh, interpret: bool
) -> jnp.ndarray:
    def body(col_b, val_b, lrow_b, wloc_b, x_local):
        x_full = jax.lax.all_gather(x_local, AXIS, axis=0, tiled=True)
        plan = _local_plan(mg, col_b[0], val_b[0], lrow_b[0], wloc_b[0])
        return _spmm_onehot_impl(plan, x_full, interpret)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # type, which the vma checker (rightly) rejects; correctness here is
    # pinned by the scipy-oracle mesh tests instead
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS, None)),
        out_specs=P(AXIS, None),
        check_vma=False,
    )(mg.col, mg.val, mg.lrow, mg.wloc, x)


def _halo_impl(
    mg: MeshOneHotHalo, x: jnp.ndarray, mesh: Mesh, interpret: bool
) -> jnp.ndarray:
    n_shards = mg.n_shards
    rps = mg.rows_per_shard
    ring = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def body(col_b, val_b, lrow_b, wloc_b, x_local):
        # local views: [1, P, ...] -> [P, ...]
        col_b, val_b = col_b[0], val_b[0]
        lrow_b, wloc_b = lrow_b[0], wloc_b[0]
        p = jax.lax.axis_index(AXIS)
        f = x_local.shape[1]

        def step(s, carry):
            acc, h = carry
            q = jax.lax.rem(p + s, n_shards)  # whose block we hold now
            plan = _local_plan(
                mg,
                jax.lax.dynamic_index_in_dim(col_b, q, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(val_b, q, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(lrow_b, q, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(wloc_b, q, 0, keepdims=False),
            )
            acc = acc + _spmm_onehot_impl(plan, h, interpret)
            h = jax.lax.ppermute(h, AXIS, perm=ring)
            return acc, h

        acc = jnp.zeros((rps, f), dtype=jnp.float32)
        acc, _ = jax.lax.fori_loop(0, n_shards, step, (acc, x_local))
        return acc

    # check_vma=False: see _allgather_impl (also lets the plain zeros
    # accumulator enter the loop carry without pcast varying-axes marking)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS, None)),
        out_specs=P(AXIS, None),
        check_vma=False,
    )(mg.col, mg.val, mg.lrow, mg.wloc, x)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def spmm_mesh_onehot(
    mg, x: jnp.ndarray, mesh: Mesh, interpret: bool = False
) -> jnp.ndarray:
    """``Â @ x`` on the mesh through the one-hot MXU kernel.

    ``mg``: :class:`MeshOneHotAllGather` or :class:`MeshOneHotHalo`
    (dispatches on type). ``x``: [n_pad, F] row-sharded over ``mesh``.
    Differentiable in ``x``; requires a symmetric Â (sym-normalized
    adjacencies always are) — the cotangent Âᵀ g = Â g is the same mesh
    operator applied to ``g``, so the backward pays exactly one more
    kernel+collective pass and stores no edge-sized residuals.
    """
    if isinstance(mg, MeshOneHotHalo):
        return _halo_impl(mg, x, mesh, interpret)
    return _allgather_impl(mg, x, mesh, interpret)


def _mesh_onehot_fwd(mg, x, mesh, interpret):
    return spmm_mesh_onehot(mg, x, mesh, interpret), mg


def _mesh_onehot_bwd(mesh, interpret, mg, g):
    if not mg.symmetric:
        raise NotImplementedError(
            "spmm_mesh_onehot backward needs a symmetric adjacency"
        )
    return None, spmm_mesh_onehot(mg, g, mesh, interpret)


spmm_mesh_onehot.defvjp(_mesh_onehot_fwd, _mesh_onehot_bwd)
