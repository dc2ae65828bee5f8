from textgcn_tpu.inspect.topics import inspect_topics  # noqa: F401
