"""Graph containers as JAX pytrees.

Design (TPU-first, not a port):

The reference keeps its graph as a ``networkx.Graph`` converted to a scipy CSR
and then a ``torch.sparse`` COO tensor (reference trainer.py:98-151,
utils.py:196-203).  XLA wants *static shapes*, so the device-side containers
here are fixed-size, padding-aware pytrees:

- :class:`SparseGraph` — row-sorted COO with explicit static padding.  The
  padding convention is ``row = col = n_nodes`` pointing at a phantom node
  with ``val = 0`` so padded edges contribute nothing to a segment-sum and
  never alias a real node's accumulator.  ``row`` stays sorted with padding
  at the end, enabling ``indices_are_sorted=True`` fast paths.

- :class:`BlockSparseGraph` — BSR-style block-sparse layout (dense
  ``bm x bn`` tiles + block coordinates) for the Pallas MXU SpMM kernel.
  Blocks are sorted by block-row so the kernel can accumulate into a
  revisited output tile.

Host-side construction utilities live in :mod:`textgcn_tpu.graph.normalize`
and the builder modules; they work in numpy/scipy and only convert to device
pytrees at the jit boundary.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row", "col", "val"],
    meta_fields=["n_nodes", "n_edges"],
)
@dataclasses.dataclass(frozen=True)
class SparseGraph:
    """Row-sorted padded COO sparse matrix (square, ``n_nodes`` x ``n_nodes``).

    Attributes:
      row:      [E_pad] int32, ascending; padding entries equal ``n_nodes``.
      col:      [E_pad] int32; padding entries equal ``n_nodes``.
      val:      [E_pad] float; padding entries are 0.
      n_nodes:  static — true number of nodes (segment count for SpMM).
      n_edges:  static — number of real (non-padding) entries.
    """

    row: jnp.ndarray
    col: jnp.ndarray
    val: jnp.ndarray
    n_nodes: int
    n_edges: int

    @property
    def n_padded_edges(self) -> int:
        return self.row.shape[0]

    @staticmethod
    def from_coo(
        row: np.ndarray,
        col: np.ndarray,
        val: np.ndarray,
        n_nodes: int,
        pad_to_multiple: int = 1024,
        dtype=jnp.float32,
    ) -> "SparseGraph":
        """Build from host COO arrays; sorts by (row, col) and pads."""
        row = np.asarray(row, dtype=np.int64)
        col = np.asarray(col, dtype=np.int64)
        val = np.asarray(val, dtype=np.float64)
        order = np.lexsort((col, row))
        row, col, val = row[order], col[order], val[order]
        e = row.shape[0]
        e_pad = max(_round_up(max(e, 1), pad_to_multiple), pad_to_multiple)
        prow = np.full((e_pad,), n_nodes, dtype=np.int32)
        pcol = np.full((e_pad,), n_nodes, dtype=np.int32)
        pval = np.zeros((e_pad,), dtype=np.float64)
        prow[:e] = row
        pcol[:e] = col
        pval[:e] = val
        return SparseGraph(
            row=jnp.asarray(prow),
            col=jnp.asarray(pcol),
            val=jnp.asarray(pval, dtype=dtype),
            n_nodes=int(n_nodes),
            n_edges=int(e),
        )

    def to_scipy(self):
        """Back to a scipy COO (drops padding). Host-side helper for tests."""
        import scipy.sparse as sp

        e = self.n_edges
        return sp.coo_matrix(
            (
                np.asarray(self.val)[:e],
                (np.asarray(self.row)[:e], np.asarray(self.col)[:e]),
            ),
            shape=(self.n_nodes, self.n_nodes),
        )

    def to_dense(self) -> jnp.ndarray:
        """Dense [n, n] materialization (small graphs / tests only)."""
        n = self.n_nodes
        dense = jnp.zeros((n + 1, n + 1), dtype=self.val.dtype)
        dense = dense.at[self.row, self.col].add(self.val)
        return dense[:n, :n]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["a"],
    meta_fields=["n_nodes"],
)
@dataclasses.dataclass(frozen=True)
class DenseGraph:
    """Dense [N, N] adjacency — the fastest SpMM layout for small graphs.

    The real text graphs have <20k nodes; a dense ``[N, N] @ [N, F]`` is a
    single large MXU matmul with no gather/scatter at all. Materialized
    once ON DEVICE by a scatter-add from the (already resident) padded
    COO: the [N, N] table is up to a GB, and pushing a host-built copy
    through a slow host↔device link takes minutes where the on-device
    scatter takes milliseconds (R8 docword, 944 MB: observed 10+ min vs
    ~35 s including compile through the tunnel).
    """

    a: jnp.ndarray  # [n, n] float32
    n_nodes: int

    @staticmethod
    def from_sparse_graph(g: "SparseGraph") -> "DenseGraph":
        n = int(g.n_nodes)

        @partial(jax.jit, static_argnames=())
        def densify(row, col, val):
            # padded entries carry row == col == n → land in the phantom
            # rim and are sliced off (val is 0 there anyway)
            d = jnp.zeros((n + 1, n + 1), dtype=jnp.float32)
            return d.at[row, col].add(val.astype(jnp.float32))[:n, :n]

        return DenseGraph(a=densify(g.row, g.col, g.val), n_nodes=n)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "block_rows", "block_cols"],
    meta_fields=["n_nodes", "n_edges", "bm", "bn", "n_block_rows", "symmetric"],
)
@dataclasses.dataclass(frozen=True)
class BlockSparseGraph:
    """BSR-style block-sparse matrix for the Pallas MXU SpMM kernel.

    Attributes:
      blocks:       [nnzb, bm, bn] dense tiles (bf16 or f32).
      block_rows:   [nnzb] int32 block-row index of each tile, ascending.
      block_cols:   [nnzb] int32 block-col index of each tile.
      n_nodes:      static — true node count (<= n_block_rows * bm).
      n_edges:      static — number of real scalar nonzeros.
      bm, bn:       static — tile shape.
      n_block_rows: static — number of block rows (padded node dim / bm).
      symmetric:    static — caller asserts Âᵀ = Â (values too); enables the
                    transpose-free custom VJP in :mod:`textgcn_tpu.ops.spmm`.
    """

    blocks: jnp.ndarray
    block_rows: jnp.ndarray
    block_cols: jnp.ndarray
    n_nodes: int
    n_edges: int
    bm: int
    bn: int
    n_block_rows: int
    symmetric: bool = False

    @property
    def nnzb(self) -> int:
        return self.blocks.shape[0]

    @staticmethod
    def from_coo(
        row: np.ndarray,
        col: np.ndarray,
        val: np.ndarray,
        n_nodes: int,
        bm: int = 128,
        bn: int = 128,
        dtype=jnp.float32,
        max_block_bytes: int = 2 << 30,
        symmetric: bool = False,
    ) -> "BlockSparseGraph":
        """Tile a COO matrix into dense (bm, bn) blocks, keeping nonzero tiles.

        Blocks are sorted by (block_row, block_col) so that the Pallas kernel
        can accumulate consecutive tiles of the same block-row in VMEM.

        BSR is a *clustered-structure* format: it shines when edges
        concentrate in few tiles (doc-topic graphs, degree-sorted corpora).
        For uniformly sparse graphs the dense-tile materialization explodes;
        ``max_block_bytes`` guards against that — use the segment-sum SpMM
        there instead.
        """
        row = np.asarray(row, dtype=np.int64)
        col = np.asarray(col, dtype=np.int64)
        val = np.asarray(val, dtype=np.float64)
        n_pad = _round_up(max(n_nodes, 1), max(bm, bn))
        n_block_rows = n_pad // bm

        brow = row // bm
        bcol = col // bn
        bkey = brow * (n_pad // bn) + bcol
        order = np.argsort(bkey, kind="stable")
        row, col, val, bkey = row[order], col[order], val[order], bkey[order]

        uniq_keys, starts = np.unique(bkey, return_index=True)
        # The Pallas kernel zero-initializes an output tile only when it first
        # visits that block-row; an absent block-row would leave garbage in the
        # output. Guarantee coverage by adding an explicit zero diagonal block
        # for every empty block-row.
        n_block_cols = n_pad // bn
        present = np.zeros(n_block_rows, dtype=bool)
        if len(uniq_keys):
            present[(uniq_keys // n_block_cols).astype(np.int64)] = True
        missing = np.nonzero(~present)[0]
        if len(missing):
            extra_keys = missing * n_block_cols + np.minimum(missing, n_block_cols - 1)
            uniq_keys = np.sort(np.concatenate([uniq_keys, extra_keys]))
        nnzb = max(len(uniq_keys), 1)
        itemsize = jnp.dtype(dtype).itemsize
        if nnzb * bm * bn * itemsize > max_block_bytes:
            raise ValueError(
                f"BSR blocks would take {nnzb * bm * bn * itemsize / 1e9:.1f}"
                f" GB ({nnzb} tiles of {bm}x{bn}); the graph is too uniformly"
                " sparse for block format — use the segment-sum SpMM"
                " (SparseGraph) or raise max_block_bytes"
            )
        blocks = np.zeros((nnzb, bm, bn), dtype=np.float32)
        block_rows = np.zeros((nnzb,), dtype=np.int32)
        block_cols = np.zeros((nnzb,), dtype=np.int32)
        if len(uniq_keys):
            block_rows[: len(uniq_keys)] = uniq_keys // (n_pad // bn)
            block_cols[: len(uniq_keys)] = uniq_keys % (n_pad // bn)
            block_of_edge = np.searchsorted(uniq_keys, bkey)
            lr = row - block_rows[block_of_edge].astype(np.int64) * bm
            lc = col - block_cols[block_of_edge].astype(np.int64) * bn
            np.add.at(blocks, (block_of_edge, lr, lc), val)
        return BlockSparseGraph(
            blocks=jnp.asarray(blocks, dtype=dtype),
            block_rows=jnp.asarray(block_rows),
            block_cols=jnp.asarray(block_cols),
            n_nodes=int(n_nodes),
            n_edges=int(len(row)),
            bm=int(bm),
            bn=int(bn),
            n_block_rows=int(n_block_rows),
            symmetric=bool(symmetric),
        )

    @staticmethod
    def from_sparse_graph(
        g: SparseGraph,
        bm: int = 128,
        bn: int = 128,
        dtype=jnp.float32,
        symmetric: bool = False,
    ) -> "BlockSparseGraph":
        e = g.n_edges
        return BlockSparseGraph.from_coo(
            np.asarray(g.row)[:e],
            np.asarray(g.col)[:e],
            np.asarray(g.val)[:e],
            g.n_nodes,
            bm=bm,
            bn=bn,
            dtype=dtype,
            symmetric=symmetric,
        )

    def transpose(self) -> "BlockSparseGraph":
        """Host-side Âᵀ in BSR form (for the VJP of non-symmetric graphs).

        Rebuilds via ``from_coo`` on the swapped COO so the kernel's
        invariants (block-row sort, every block-row present) hold.
        """
        import scipy.sparse as sp

        blocks = np.asarray(self.blocks, dtype=np.float64)
        nnzb, bm, bn = blocks.shape
        brows = np.asarray(self.block_rows, dtype=np.int64)
        bcols = np.asarray(self.block_cols, dtype=np.int64)
        bi, lr, lc = np.nonzero(blocks)
        row = brows[bi] * bm + lr
        col = bcols[bi] * bn + lc
        val = blocks[bi, lr, lc]
        keep = (row < self.n_nodes) & (col < self.n_nodes)
        m = sp.coo_matrix(
            (val[keep], (col[keep], row[keep])),
            shape=(self.n_nodes, self.n_nodes),
        ).tocoo()
        return BlockSparseGraph.from_coo(
            m.row,
            m.col,
            m.data,
            self.n_nodes,
            bm=self.bn,
            bn=self.bm,
            dtype=self.blocks.dtype,
            symmetric=self.symmetric,
        )
