"""Graph-format / SpMM-kernel selection.

The framework stores every built graph as a normalized :class:`SparseGraph`
(row-sorted COO). Which *kernel* aggregates it is a performance choice, not
a semantics choice — all formats compute the same ``Â @ x`` (the reference
has exactly one path, ``torch.spmm``, reference layer.py:102,106). This
module converts a ``SparseGraph`` into the container whose SpMM dispatch
(:func:`textgcn_tpu.ops.spmm.spmm`) runs fastest for its structure:

==========  ==============================================================
format      kernel / when it wins
==========  ==============================================================
segment     gather + ``segment_sum`` (pure XLA). Always correct; the
            fallback and oracle. ~6% of HBM roofline on big graphs.
dense       one [N, N] @ [N, F] MXU matmul. Fastest below ~10k nodes
            (the [N, N] materialization is the only cost: 4·N² bytes).
bsr         Pallas block-sparse MXU kernel — edges must cluster into
            128×128 tiles (doc–topic graphs already do).
onehot      gather + one-hot-MXU segment reduce — uniform sparsity.
hybrid      degree-sort permutation, then dense tiles → bsr and the
            residual → onehot. The large-real-graph default: power-law
            corpora concentrate most edges into the hub bands.
auto        dense if N ≤ ``dense_max_nodes`` else hybrid.
==========  ==============================================================

``hybrid`` relabels nodes (P Â Pᵀ), so :func:`convert_graph` returns the
permutation alongside the container; callers must apply it to features,
labels, and split indices (``perm[old] = new``). All other formats return
``perm=None``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from textgcn_tpu.graph.structs import (
    BlockSparseGraph,
    DenseGraph,
    SparseGraph,
)

SPMM_FORMATS = ("auto", "segment", "dense", "bsr", "onehot", "hybrid")

# Below this, the [N, N] dense materialization is ≤ ~0.4 GB and one MXU
# matmul beats any sparse path on TPU. R8/mr/20ng graphs all sit under it.
DENSE_MAX_NODES = 10_000


def convert_graph(
    g: SparseGraph,
    fmt: str = "auto",
    *,
    symmetric: bool = True,
    dense_max_nodes: int = DENSE_MAX_NODES,
) -> Tuple[object, Optional[np.ndarray]]:
    """SparseGraph → (graph container, node permutation or None).

    ``symmetric=True`` asserts value-symmetry of the matrix (true for every
    sym-normalized Â this framework trains on); it enables the
    transpose-free VJPs of the bsr/onehot/hybrid kernels.
    """
    if fmt not in SPMM_FORMATS:
        raise ValueError(
            f"unknown spmm format {fmt!r}; choose one of {SPMM_FORMATS}"
        )
    if fmt == "auto":
        fmt = "dense" if g.n_nodes <= dense_max_nodes else "hybrid"
    if fmt == "segment":
        return g, None
    if fmt == "dense":
        return DenseGraph.from_sparse_graph(g), None
    e = g.n_edges
    row = np.asarray(g.row)[:e]
    col = np.asarray(g.col)[:e]
    val = np.asarray(g.val)[:e]
    if fmt == "bsr":
        return (
            BlockSparseGraph.from_coo(
                row, col, val, g.n_nodes, symmetric=symmetric
            ),
            None,
        )
    if fmt == "onehot":
        from textgcn_tpu.ops.pallas_onehot import OneHotGraph

        return (
            OneHotGraph.from_coo(
                row, col, val, g.n_nodes, symmetric=symmetric
            ),
            None,
        )
    # hybrid: degree-sort then split into dense tiles + residual stream
    from textgcn_tpu.graph.reorder import reorder_and_build

    perm, hybrid = reorder_and_build(
        row, col, val, g.n_nodes, symmetric=symmetric
    )
    return hybrid, perm


def permute_rows(x: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """Relabel row ``old`` to row ``perm[old]`` (new[perm[i]] = old[i])."""
    out = np.empty_like(x)
    out[perm] = x
    return out
