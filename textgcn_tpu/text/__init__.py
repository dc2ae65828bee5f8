from textgcn_tpu.text.datasets import DatasetLabels, load_labels  # noqa: F401
