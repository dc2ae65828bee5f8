from textgcn_tpu.utils.logging import LogResult, format_table, graph_stats  # noqa: F401
from textgcn_tpu.utils.config import ExperimentConfig  # noqa: F401
