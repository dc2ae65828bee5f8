"""textgcn_tpu — a TPU-native graph-convolutional framework for text classification.

A from-scratch JAX/XLA/Pallas re-design of the TopicGCN/TextGCN capability set
(reference: anargh-t/Graph-Convolutional-Networks-for-Text-Classification):

- text corpus cleaning and dataset loading              (``textgcn_tpu.text``)
- LDA topic modeling + Word2Vec topic embeddings,
  both implemented natively in JAX (MXU-friendly EM)    (``textgcn_tpu.topics``)
- document–topic–topic and document–word graph
  construction with symmetric normalization             (``textgcn_tpu.graph``)
- sparse matmul (SpMM) kernels: segment-sum reference,
  dense, and Pallas block-sparse TPU kernels            (``textgcn_tpu.ops``)
- two-layer GCN models as pure-functional pytrees       (``textgcn_tpu.models``)
- jitted full-batch semi-supervised training with
  early stopping, metrics and multi-seed reports        (``textgcn_tpu.train``)
- multi-chip execution over a ``jax.sharding.Mesh``     (``textgcn_tpu.parallel``)
"""

__version__ = "0.1.0"

from textgcn_tpu.graph.structs import SparseGraph, BlockSparseGraph  # noqa: F401
