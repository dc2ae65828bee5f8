"""Pallas TPU block-sparse SpMM (BSR × dense) — the large-graph hot kernel.

Replaces the reference's ``torch.spmm`` (reference layer.py:102,106) for
graphs too large/sparse for a dense matmul. TPU-first design:

- The adjacency is tiled into dense ``bm x bn`` blocks
  (:class:`textgcn_tpu.graph.structs.BlockSparseGraph`), keeping only nonzero
  tiles, sorted by block-row.
- The kernel runs a **flat grid over nonzero blocks** with the block
  coordinates scalar-prefetched (``PrefetchScalarGridSpec``), so the
  ``x``-tile and output-tile DMAs are driven by data-dependent indices that
  are known before each grid step (Mosaic pipelines them).
- Each step issues one ``(bm, bn) @ (bn, F)`` MXU matmul and accumulates into
  the output tile, which stays resident in VMEM for consecutive blocks of the
  same block-row (output revisiting); it is zeroed on first visit.

Requirements (enforced by ``BlockSparseGraph.from_coo``):
- blocks sorted ascending by block-row;
- every block-row present at least once (self-loops guarantee this for Â).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from textgcn_tpu.graph.structs import BlockSparseGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Grouped (K-packed) BSR: G tiles of one block-row per grid step
# ---------------------------------------------------------------------------
#
# The flat one-tile-per-step kernel is per-step-overhead bound (~1.1us/step
# vs ~0.4us DMA+MXU floor at 128x128xF=256). Packing G tiles of the SAME
# block-row into one step turns G small matmuls into one
# (bm, G*bn) @ (G*bn, F) MXU call and cuts step count by G. Rows' tile
# lists are padded to a multiple of G with zero tiles pointing at col 0 —
# they contribute nothing.


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "group_rows", "group_cols"],
    meta_fields=["n_nodes", "bm", "bn", "group", "n_block_rows", "n_edges"],
)
@dataclasses.dataclass(frozen=True)
class GroupedBSR:
    blocks: jnp.ndarray  # [n_groups, bm, group*bn]
    group_rows: jnp.ndarray  # [n_groups] int32, ascending
    group_cols: jnp.ndarray  # [n_groups * group] int32, flat (2-D scalar
    # prefetch arrays are padded in SMEM and can blow the 1 MB budget)
    n_nodes: int
    bm: int
    bn: int
    group: int
    n_block_rows: int
    n_edges: int = 0  # real nnz carried by the tiles (for edges/s reporting)


def _row_tile_counts(rows):
    """(row_start_indices, counts) for an ascending block-row array."""
    import numpy as np

    t = len(rows)
    change = np.r_[True, rows[1:] != rows[:-1]]
    starts = np.flatnonzero(change)
    counts = np.diff(np.r_[starts, t])
    return starts, counts


def choose_group(g: BlockSparseGraph, max_pad_frac: float = 0.25) -> int:
    """Largest group in {16, 8, 4, 2, 1} whose zero-tile padding stays
    under ``max_pad_frac`` of the real tile count.

    Grouping packs each block-row's tile list to a multiple of G with zero
    tiles; rows with few tiles (tiny graphs, topic-graph Â) would pay up to
    Gx wasted MXU work, so the group size must follow the row-occupancy
    distribution rather than being a constant. G=16 entered the candidate
    set with the min_nnz=24 split (more tiles per row → padding stays
    cheap): measured 2.52 ms vs 2.60 ms at G=8 on the R8 docword pass —
    grid-step overhead halves and outweighs the extra zero-tile stream.
    """
    import numpy as np

    rows = np.asarray(g.block_rows)
    if len(rows) == 0:
        return 1
    _, counts = _row_tile_counts(rows)
    t = counts.sum()
    for grp in (16, 8, 4, 2):
        padded = (-(-counts // grp) * grp).sum()
        if padded - t <= max_pad_frac * t:
            return grp
    return 1


def pack_groups(g: BlockSparseGraph, group: int = 4) -> GroupedBSR:
    """Pack a BlockSparseGraph into row-uniform groups (host-side, O(T))."""
    import numpy as np

    blocks = np.asarray(g.blocks)
    rows = np.asarray(g.block_rows)
    cols = np.asarray(g.block_cols)
    t = len(rows)
    starts, counts = _row_tile_counts(rows)
    pos_in_row = np.arange(t) - np.repeat(starts, counts)
    groups_per_row = -(-counts // group)
    total_groups = int(groups_per_row.sum())
    first_group_of_row = np.r_[0, np.cumsum(groups_per_row)[:-1]]
    gid = np.repeat(first_group_of_row, counts) + pos_in_row // group
    slot = pos_in_row % group
    # tile k of a group occupies columns [k*bn, (k+1)*bn) of the packed block
    out4 = np.zeros((total_groups, group, g.bm, g.bn), dtype=blocks.dtype)
    out4[gid, slot] = blocks
    out_blocks = np.ascontiguousarray(out4.transpose(0, 2, 1, 3)).reshape(
        total_groups, g.bm, group * g.bn
    )
    out_cols = np.zeros(total_groups * group, dtype=np.int32)
    out_cols[gid * group + slot] = cols
    out_rows = np.repeat(rows[starts], groups_per_row).astype(np.int32)
    return GroupedBSR(
        blocks=jnp.asarray(out_blocks),
        group_rows=jnp.asarray(out_rows),
        group_cols=jnp.asarray(out_cols),
        n_nodes=g.n_nodes,
        bm=g.bm,
        bn=g.bn,
        group=group,
        n_block_rows=g.n_block_rows,
        n_edges=g.n_edges,
    )


def _make_grouped_kernel(group: int):
    def kernel(rows_ref, cols_ref, a_ref, *rest):
        xs = rest[:group]
        o_ref = rest[group]
        i = pl.program_id(0)
        is_new_row = jnp.logical_or(
            i == 0, rows_ref[jnp.maximum(i - 1, 0)] != rows_ref[i]
        )

        @pl.when(is_new_row)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        xg = jnp.concatenate([x[...] for x in xs], axis=0)
        o_ref[...] += jax.lax.dot(
            a_ref[0], xg, preferred_element_type=jnp.float32
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def spmm_bsr_grouped(
    gg: GroupedBSR, x: jnp.ndarray, interpret: bool = False, bf16: bool = False
):
    """Â @ x via the grouped BSR kernel."""
    n = gg.n_nodes
    bm = gg.bm
    n_pad = gg.n_block_rows * bm
    f = x.shape[1]
    f_pad = _round_up(f, 128)
    xp = jnp.zeros((n_pad, f_pad), dtype=x.dtype)
    xp = xp.at[:n, :f].set(x)
    if bf16:
        xp = xp.astype(jnp.bfloat16)
    out = _spmm_bsr_grouped_padded(gg, xp, interpret, bf16)
    return out[:n, :f]


def _spmm_bsr_grouped_padded(
    gg: GroupedBSR, xp: jnp.ndarray, interpret: bool, bf16: bool
):
    """Grouped kernel on a PRE-padded [n_pad, f_pad] feature table,
    returning the PADDED [n_pad, f_pad] f32 output (no slice) — the entry
    the hybrid path uses so one padded bf16 table and one final slice are
    shared across both legs.

    The blocks cast is CONDITIONAL: HybridGraph stores its tile leg in
    bf16 at build time, so the hot path pays no per-pass f32→bf16 cast of
    the (tens-of-MB) block stack — round 3 measured the hybrid at 61% of
    bound with the cast inside the pass; storing bf16 removes
    ~3×|blocks| bytes of per-pass traffic.
    """
    bm, bn, group = gg.bm, gg.bn, gg.group
    n_pad = gg.n_block_rows * bm
    f_pad = xp.shape[1]
    if bf16 and gg.blocks.dtype != jnp.bfloat16:
        gg = dataclasses.replace(gg, blocks=gg.blocks.astype(jnp.bfloat16))
    elif not bf16 and gg.blocks.dtype == jnp.bfloat16:
        # f32-exact contract: the tile VALUES were already rounded at
        # build time, so silently running would return bf16-precision
        # results from an "exact" call (advisor r4 finding)
        raise ValueError(
            "bf16=False but the BSR tile stack was stored bf16 — rebuild "
            "the graph with store_bf16=False for the f32-exact kernel"
        )

    n_groups = gg.blocks.shape[0]

    def x_spec(k):
        return pl.BlockSpec(
            (bn, f_pad), lambda i, rows, cols, k=k: (cols[i * group + k], 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, bm, group * bn), lambda i, rows, cols: (i, 0, 0)),
        ]
        + [x_spec(k) for k in range(group)],
        out_specs=pl.BlockSpec((bm, f_pad), lambda i, rows, cols: (rows[i], 0)),
    )
    out = pl.pallas_call(
        _make_grouped_kernel(group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_groups * bm * group * bn * f_pad,
            bytes_accessed=n_groups
            * (
                bm * group * bn * gg.blocks.dtype.itemsize
                + group * bn * f_pad * xp.dtype.itemsize
            )
            + n_pad * f_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(gg.group_rows, gg.group_cols, gg.blocks, *([xp] * group))
    return out


def _bsr_kernel(rows_ref, cols_ref, a_ref, x_ref, o_ref):
    i = pl.program_id(0)
    is_new_row = jnp.logical_or(
        i == 0, rows_ref[jnp.maximum(i - 1, 0)] != rows_ref[i]
    )

    @pl.when(is_new_row)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot(
        a_ref[0], x_ref[...], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def spmm_bsr(
    graph: BlockSparseGraph,
    x: jnp.ndarray,
    interpret: bool = False,
    bf16: bool = False,
):
    """Â @ x via the Pallas BSR kernel.

    Args:
      graph: BlockSparseGraph over n_nodes (blocks cover a padded square dim).
      x: [n_nodes, F] features.
      bf16: cast blocks and features to bfloat16 on the way in (halves HBM
        traffic, doubles MXU rate; accumulation stays float32). Adjacency
        values are normalized edge weights in [0, 1] — well inside bf16
        range; end-task accuracy is unaffected at GCN precision needs.
    Returns:
      [n_nodes, F] float32.
    """
    n = graph.n_nodes
    bm = graph.bm
    n_pad = graph.n_block_rows * bm
    f = x.shape[1]
    f_pad = _round_up(f, 128)
    xp = jnp.zeros((n_pad, f_pad), dtype=x.dtype)
    xp = xp.at[:n, :f].set(x)
    if bf16:
        xp = xp.astype(jnp.bfloat16)
    out = _spmm_bsr_padded(graph, xp, interpret, bf16)
    return out[:n, :f]


def _spmm_bsr_padded(
    graph: BlockSparseGraph, xp: jnp.ndarray, interpret: bool, bf16: bool
):
    """Flat BSR kernel on a pre-padded table → padded [n_pad, f_pad] f32
    (see :func:`_spmm_bsr_grouped_padded` for why)."""
    bm, bn = graph.bm, graph.bn
    n_pad = graph.n_block_rows * bm
    f_pad = xp.shape[1]
    if bf16 and graph.blocks.dtype != jnp.bfloat16:
        graph = dataclasses.replace(
            graph, blocks=graph.blocks.astype(jnp.bfloat16)
        )
    elif not bf16 and graph.blocks.dtype == jnp.bfloat16:
        raise ValueError(
            "bf16=False but the BSR tile stack was stored bf16 — rebuild "
            "the graph with store_bf16=False for the f32-exact kernel"
        )

    nnzb = graph.blocks.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnzb,),
        in_specs=[
            pl.BlockSpec((1, bm, bn), lambda i, rows, cols: (i, 0, 0)),
            pl.BlockSpec((bn, f_pad), lambda i, rows, cols: (cols[i], 0)),
        ],
        out_specs=pl.BlockSpec((bm, f_pad), lambda i, rows, cols: (rows[i], 0)),
    )
    flops = 2 * nnzb * bm * bn * f_pad
    out = pl.pallas_call(
        _bsr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                graph.blocks.size * graph.blocks.dtype.itemsize
                + nnzb * bn * f_pad * xp.dtype.itemsize
                + n_pad * f_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(graph.block_rows, graph.block_cols, graph.blocks, xp)
    return out
