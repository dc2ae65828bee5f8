from textgcn_tpu.train.metrics import accuracy, macro_f1  # noqa: F401
from textgcn_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401
