from textgcn_tpu.ops.spmm import spmm, spmm_coo_segment, spmm_dense  # noqa: F401
