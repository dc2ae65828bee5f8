from textgcn_tpu.models.gcn import GCN, gcn_init, gcn_forward  # noqa: F401
