"""Graph reordering + hybrid tile/stream SpMM layout.

The one-hot kernel (:mod:`textgcn_tpu.ops.pallas_onehot`) is gather-bound:
its ceiling is the TPU's random-row gather rate (~60-130M rows/s), not HBM
stream bandwidth. The only way past that wall is *structural*: relabel nodes
so that edges concentrate into dense 128x128 tiles the MXU BSR kernel
(:mod:`textgcn_tpu.ops.pallas_spmm`) can chew at >600M edges/s, and stream
only the residual uniform edges through the gather path.

For power-law graphs (real corpora: word-word PMI graphs, doc-word graphs
sorted by document frequency) a plain **degree sort** already concentrates a
large fraction of edges into the hub-hub / hub-tail bands:

  perm = argsort(degree, descending);  A' = P A P^T

``HybridGraph`` then splits A' by per-tile occupancy: tiles with >= tau
nonzeros become BSR blocks (MXU path), the rest stay an edge stream for the
one-hot kernel. Both parts are symmetric whenever A is (occupancy of tile
(i,j) equals tile (j,i) for a symmetric pattern, and tau-thresholding
preserves that), so the VJP of ``spmm_hybrid`` on a normalized adjacency is
the same operator.

No reference counterpart — the reference's only sparse op is single-device
``torch.spmm`` (reference layer.py:102,106); this module is part of the
TPU-native scaling layer.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from textgcn_tpu.graph.structs import BlockSparseGraph


def degree_sort_permutation(
    row: np.ndarray, col: np.ndarray, n_nodes: int
) -> np.ndarray:
    """``perm[old_id] = new_id`` with highest-degree nodes first.

    Degree counts both endpoints, so it is the total degree for symmetric
    COO inputs and in+out degree otherwise. Ties break by old id, keeping
    the permutation deterministic.
    """
    deg = np.bincount(np.asarray(row), minlength=n_nodes) + np.bincount(
        np.asarray(col), minlength=n_nodes
    )
    order = np.argsort(-deg, kind="stable")  # old ids, hubs first
    perm = np.empty(n_nodes, dtype=np.int64)
    perm[order] = np.arange(n_nodes, dtype=np.int64)
    return perm


def permute_coo(row, col, val, perm):
    """Relabel a COO pattern: returns (perm[row], perm[col], val)."""
    perm = np.asarray(perm)
    return perm[np.asarray(row)], perm[np.asarray(col)], np.asarray(val)


def tile_fill_threshold_split(
    row: np.ndarray,
    col: np.ndarray,
    n_nodes: int,
    bm: int = 128,
    bn: int = 128,
    min_nnz: int = 24,
    max_block_bytes: int = 2 << 30,
    block_itemsize: int = 4,
):
    """Boolean edge mask selecting the BSR (dense-tile) part.

    A tile goes to the BSR part when it holds >= tau nonzeros, where
    tau >= ``min_nnz`` is raised (if needed) until the selected tiles'
    dense storage fits ``max_block_bytes``. Thresholding on occupancy alone
    keeps the split symmetric for symmetric patterns.

    ``min_nnz=24`` is the measured optimum (R8 docword sweep,
    results/minnnz_probe.json): a grouped bf16 tile costs ~0.26 us of
    HBM stream + amortized grid step, while a residual edge costs
    ~11 ns through the gather+one-hot path (granule-bound gather plus
    the [E, F] product round-trip), so a tile pays for itself at ~24
    edges — 64 left 2x too many edges on the slow leg (3.03 ms vs
    2.55 ms per hybrid pass at F=200), while 16 over-tiles (3.14 ms).
    """
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    n_bcols = -(-max(n_nodes, 1) // bn)
    key = (row // bm) * n_bcols + (col // bn)
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)

    tile_bytes = bm * bn * block_itemsize
    budget_tiles = max(1, max_block_bytes // tile_bytes)
    tau = min_nnz
    n_sel = int((counts >= tau).sum())
    if n_sel > budget_tiles:
        # raise tau to the budget_tiles-th largest occupancy
        tau = int(np.sort(counts)[::-1][budget_tiles - 1]) + 1
        n_sel = int((counts >= tau).sum())
    return (counts >= tau)[inv]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bsr", "rest"],
    meta_fields=["n_nodes", "n_edges", "symmetric"],
)
@dataclasses.dataclass(frozen=True)
class HybridGraph:
    """Dense-tile BSR part + residual one-hot edge stream.

    ``bsr`` holds the tile leg as either a flat
    :class:`~textgcn_tpu.graph.structs.BlockSparseGraph` or a K-packed
    :class:`~textgcn_tpu.ops.pallas_spmm.GroupedBSR` — ``from_coo`` picks
    the grouped layout whenever zero-tile padding stays cheap
    (:func:`~textgcn_tpu.ops.pallas_spmm.choose_group`), worth ~30% on the
    tile leg by cutting per-grid-step overhead. ``rest`` is an
    :class:`~textgcn_tpu.ops.pallas_onehot.OneHotGraph` (or ``None`` when
    every edge landed in a dense tile).
    """

    bsr: object  # BlockSparseGraph | GroupedBSR
    rest: object  # OneHotGraph | None
    n_nodes: int
    n_edges: int
    symmetric: bool

    @staticmethod
    def from_coo(
        row: np.ndarray,
        col: np.ndarray,
        val: np.ndarray,
        n_nodes: int,
        symmetric: bool = False,
        bm: int = 128,
        bn: int = 128,
        min_nnz: int = 24,
        max_block_bytes: int = 2 << 30,
        onehot_kwargs: dict | None = None,
        group: int | None = None,
        store_bf16: bool = True,
    ) -> "HybridGraph":
        """Build the hybrid layout.

        ``group``: tiles-per-grid-step for the BSR leg. ``None`` (default)
        picks the largest of {8,4,2,1} whose zero-padding overhead is <25%;
        ``1`` forces the flat one-tile-per-step kernel.

        ``store_bf16``: store the BSR tile stack in bfloat16 at BUILD time
        (matching ``spmm_hybrid``'s default bf16 execution). Round 3 paid
        an f32→bf16 cast of the whole block stack INSIDE every pass —
        ~3×|blocks| bytes of pure HBM traffic per aggregation; the hot
        path now reads the tiles at their stored width. Pass ``False``
        only to run the f32-exact kernel (``spmm_hybrid(..., bf16=False)``).

        The BSR leg's padded height is rounded up to the residual plan's
        window size (``w``), so the one-hot leg can accumulate directly
        onto the BSR output block-for-block (no pad/slice copies between
        the legs — see ``_spmm_hybrid_fwd_impl``).
        """
        from textgcn_tpu.ops.pallas_onehot import OneHotGraph
        from textgcn_tpu.ops.pallas_spmm import choose_group, pack_groups

        row = np.asarray(row, dtype=np.int64)
        col = np.asarray(col, dtype=np.int64)
        val = np.asarray(val, dtype=np.float64)
        dense_mask = tile_fill_threshold_split(
            row,
            col,
            n_nodes,
            bm=bm,
            bn=bn,
            min_nnz=min_nnz,
            max_block_bytes=max_block_bytes,
        )
        w_oh = (onehot_kwargs or {}).get("w", 512)
        n_bsr = n_nodes
        if w_oh % bm == 0:
            # align the BSR leg's padded rows to the one-hot window grid
            # (empty trailing block-rows get the coverage zero tiles)
            n_bsr = -(-n_nodes // w_oh) * w_oh
        bsr = BlockSparseGraph.from_coo(
            row[dense_mask],
            col[dense_mask],
            val[dense_mask],
            n_bsr,
            bm=bm,
            bn=bn,
            max_block_bytes=max_block_bytes + (64 << 20),
        )
        grp = choose_group(bsr) if group is None else int(group)
        if grp > 1:
            bsr = pack_groups(bsr, grp)
        if store_bf16:
            bsr = dataclasses.replace(
                bsr, blocks=bsr.blocks.astype(jnp.bfloat16)
            )
        n_rest = int((~dense_mask).sum())
        rest = None
        if n_rest:
            rest = OneHotGraph.from_coo(
                row[~dense_mask],
                col[~dense_mask],
                val[~dense_mask],
                n_nodes,
                symmetric=False,  # the residual of a symmetric split IS
                # symmetric in pattern, but OneHotGraph.symmetric aliases the
                # bwd plan to fwd which also needs symmetric *values*; Â is
                # value-symmetric, so allow aliasing when caller says so.
                **(onehot_kwargs or {}),
            )
            if symmetric:
                rest = dataclasses.replace(
                    rest, bwd=rest.fwd, symmetric=True
                )
        return HybridGraph(
            bsr=bsr,
            rest=rest,
            n_nodes=int(n_nodes),
            n_edges=int(len(row)),
            symmetric=bool(symmetric),
        )

    @property
    def dense_fraction(self) -> float:
        return self.bsr.n_edges / max(self.n_edges, 1)


def reorder_and_build(
    row, col, val, n_nodes, symmetric: bool = False, perm=None, **kwargs
):
    """Degree-sort, then build the hybrid layout on the permuted pattern.

    Returns ``(perm, hybrid)`` with ``perm[old] = new``. The caller must
    apply the same permutation to features/labels: SpMM computes
    ``P Â Pᵀ (P x)`` = ``P (Â x)``. A precomputed ``perm`` (e.g. from the
    auto cost model's pricing pass) skips the host degree sort.
    """
    if perm is None:
        perm = degree_sort_permutation(row, col, n_nodes)
    r2, c2, v2 = permute_coo(row, col, val, perm)
    return perm, HybridGraph.from_coo(
        r2, c2, v2, n_nodes, symmetric=symmetric, **kwargs
    )


@partial(jax.jit, static_argnames=("interpret", "bf16"))
def _spmm_hybrid_fwd_impl(
    h: HybridGraph, x: jnp.ndarray, interpret: bool = False, bf16: bool = True
):
    """One fused hybrid pass, engineered for minimal HBM traffic:

    - ONE padded feature table, built once and shared by both legs (the
      legs' own pad+downcast used to run twice per pass);
    - tile stack read at stored width (bf16 at build — no per-pass cast);
    - when the layouts align (single-superchunk residual plan whose
      window grid matches the BSR leg's padded rows — arranged by
      ``from_coo``), the one-hot leg initializes its output windows FROM
      the BSR result, fusing the ``bsr + rest`` add into the kernel and
      keeping everything padded until one final slice.
    """
    from textgcn_tpu.ops.pallas_onehot import _spmm_onehot_impl, spmm_onehot
    from textgcn_tpu.ops.pallas_spmm import (
        GroupedBSR,
        _spmm_bsr_grouped_padded,
        _spmm_bsr_padded,
    )

    n, f = h.n_nodes, x.shape[1]
    f_pad = ((f + 127) // 128) * 128
    bsr = h.bsr
    n_pad = bsr.n_block_rows * bsr.bm
    xp = jnp.zeros((n_pad, f_pad), dtype=x.dtype).at[:n, :f].set(x)
    if bf16:
        xp = xp.astype(jnp.bfloat16)
    if isinstance(bsr, GroupedBSR):
        out = _spmm_bsr_grouped_padded(bsr, xp, interpret, bf16)
    else:
        out = _spmm_bsr_padded(bsr, xp, interpret, bf16)
    if h.rest is None:
        return out[:n, :f]
    plan = h.rest.fwd
    # the one-hot leg always gathers bf16 (byte-bound; pallas_onehot
    # design) — share xp when it already is, downcast once otherwise
    xq = xp if xp.dtype == jnp.bfloat16 else xp.astype(jnp.bfloat16)
    if plan.n_sc == 1 and plan.w_sc * plan.w == n_pad:
        return _spmm_onehot_impl(
            plan, x, interpret, xp_padded=xq, base=out, keep_padded=True
        )[:n, :f]
    # layout mismatch (custom onehot_kwargs): separate legs + add
    return out[:n, :f] + spmm_onehot(
        h.rest.fwd, h.rest.bwd, x, interpret=interpret
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def spmm_hybrid(
    h: HybridGraph, x: jnp.ndarray, interpret: bool = False, bf16: bool = True
):
    """``Â @ x`` over the hybrid layout (differentiable w.r.t. ``x``).

    The VJP requires ``h.symmetric`` (Âᵀ = Â) — always true for the
    sym-normalized adjacencies this framework trains on.
    """
    return _spmm_hybrid_fwd_impl(h, x, interpret=interpret, bf16=bf16)


def _hybrid_fwd(h, x, interpret, bf16):
    return _spmm_hybrid_fwd_impl(h, x, interpret=interpret, bf16=bf16), h


def _hybrid_bwd(interpret, bf16, h, g):
    if not h.symmetric:
        raise NotImplementedError(
            "spmm_hybrid backward needs a symmetric adjacency"
        )
    return (None, _spmm_hybrid_fwd_impl(h, g, interpret=interpret, bf16=bf16))


spmm_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)
