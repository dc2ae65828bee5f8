"""YAML-driven experiment orchestrator.

Replaces the reference's subprocess-chaining ``run_experiment.py``
(reference run_experiment.py:24-164) with a **single-process** pipeline —
build → train → inspect share in-memory artifacts and one JAX runtime, with
per-stage logs and the config copied into the experiment directory.

YAML schema (same shape as the reference's experiments/r8.yaml:1-18):

  dataset: R8
  build:
    num_topics: 50
    doc_topic_threshold: 0.02
    topic_topic_threshold: 0.3
    min_df: 2
    max_df: 0.95
    use_word2vec: true
  train:
    times: 1
    shards: 8          # optional: sharded training over an 8-device mesh
    partition: halo    # halo (ppermute ring) | allgather
  inspect:
    top_n_words: 10
    top_n_docs: 5
    heatmap: true
"""
from __future__ import annotations

import os
import shutil
import sys
import time
from contextlib import contextmanager
from typing import Any, Dict

import yaml


@contextmanager
def _stage_log(log_dir: str, stage: str):
    """Tee stdout to a per-stage log (reference run_command's streaming)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{stage}.log")
    f = open(path, "w", encoding="utf-8")
    orig = sys.stdout

    class Tee:
        def write(self, s):
            orig.write(s)
            f.write(s)

        def flush(self):
            orig.flush()
            f.flush()

    sys.stdout = Tee()
    t0 = time.time()
    try:
        yield
    finally:
        sys.stdout = orig
        f.write(f"\n[stage {stage} took {time.time() - t0:.1f}s]\n")
        f.close()


def load_config(path: str) -> Dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        return yaml.safe_load(f)


def run_experiment_config(config_path: str) -> int:
    from textgcn_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    cfg = load_config(config_path)
    dataset = cfg["dataset"]
    fam = cfg.get("graph", "topic")
    exp_dir = os.path.join(
        "experiments", dataset if fam == "topic" else f"{dataset}_{fam}"
    )
    log_dir = os.path.join(exp_dir, "logs")
    res_dir = os.path.join(exp_dir, "results")
    os.makedirs(res_dir, exist_ok=True)
    shutil.copy(config_path, os.path.join(exp_dir, "config_used.yaml"))

    build_cfg = cfg.get("build", {})
    data_root = cfg.get("data_root", "data")
    family = cfg.get("graph", "topic")  # "topic" (TopicGCN) | "docword"

    with _stage_log(log_dir, "build"), timer.stage("build"):
        if family == "docword":
            from textgcn_tpu.graph.build_textgcn import TextGCNGraphBuilder

            builder = TextGCNGraphBuilder(
                dataset,
                window_size=build_cfg.get("window", 20),
                data_root=data_root,
            )
            builder.build()
            builder.save()
        else:
            from textgcn_tpu.graph.build_topic import TopicGraphBuilder

            builder = TopicGraphBuilder(
                dataset,
                num_topics=build_cfg.get("num_topics", 50),
                doc_topic_threshold=build_cfg.get("doc_topic_threshold", 0.02),
                topic_topic_threshold=build_cfg.get("topic_topic_threshold", 0.3),
                min_df=build_cfg.get("min_df", 2),
                max_df=build_cfg.get("max_df", 0.95),
                use_word2vec=build_cfg.get("use_word2vec", True),
                lda_backend=build_cfg.get("lda_backend", "jax"),
                lda_max_iter=build_cfg.get("lda_max_iter", 60),
                data_root=data_root,
            )
            builder.build()
            builder.save()

    train_cfg = cfg.get("train", {})
    with _stage_log(log_dir, "train"), timer.stage("train"):
        from textgcn_tpu.train.run import run_experiment
        from textgcn_tpu.train.trainer import TrainConfig

        tc = TrainConfig(
            n_hidden=train_cfg.get("nhid", 200),
            lr=train_cfg.get("lr", 0.02),
            dropout=train_cfg.get("dropout", 0.5),
            max_epoch=train_cfg.get("max_epoch", 200),
            early_stopping=train_cfg.get("early_stopping", 10),
            val_ratio=train_cfg.get("val_ratio", 0.1),
            spmm=train_cfg.get("spmm", "auto"),
            model=train_cfg.get("model", "gcn"),
        )
        pre = None
        if family == "docword":
            from textgcn_tpu.train.prepare import prepare_docword_data

            pre = prepare_docword_data(dataset, data_root=data_root)
        summary = run_experiment(
            dataset,
            times=train_cfg.get("times", 1),
            graph_family=family,
            data_root=data_root,
            output_dir=res_dir,
            config=tc,
            pre_data=pre,
            n_shards=train_cfg.get("shards"),
            partition=train_cfg.get("partition", "halo"),
        )
        acc = summary["test_accuracy"]
        print(f"test accuracy: mean={acc['mean']:.4f} max={acc['max']:.4f}")

    ins_cfg = cfg.get("inspect", {})
    # topic inspection only applies to the topic family
    if ins_cfg.get("enabled", True) and family == "topic":
        with _stage_log(log_dir, "inspect"), timer.stage("inspect"):
            from textgcn_tpu.inspect.topics import inspect_topics

            inspect_topics(
                dataset,
                data_root=data_root,
                top_n_words=ins_cfg.get("top_n_words", 10),
                top_n_docs=ins_cfg.get("top_n_docs", 5),
                heatmap=ins_cfg.get("heatmap", True),
                output_dir=res_dir,
            )

    # per-stage wall-clock report (replaces the reference's ad-hoc time()
    # prints, SURVEY.md §5) — printed and kept with the experiment logs
    report = timer.report()
    print(report)
    with open(
        os.path.join(log_dir, "stage_times.txt"), "w", encoding="utf-8"
    ) as f:
        f.write(report + "\n")
    return 0
