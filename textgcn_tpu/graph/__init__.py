from textgcn_tpu.graph.structs import SparseGraph, BlockSparseGraph  # noqa: F401
from textgcn_tpu.graph.normalize import (  # noqa: F401
    sym_normalize_coo,
    add_self_loops_coo,
    max_symmetrize_coo,
)
