from textgcn_tpu.topics.vectorize import CountVectorizer  # noqa: F401
from textgcn_tpu.topics.lda import LDA  # noqa: F401
from textgcn_tpu.topics.model import TopicModel, load_documents_from_file  # noqa: F401
