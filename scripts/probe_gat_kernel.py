"""GAT epoch time on the real R8 doc-word graph: segment path vs the
attention-kernel path (round-4 verdict weak #2 done-criterion: >=5x
faster epoch, parity-tested)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.chdir("/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from textgcn_tpu.train.prepare import (
        apply_attention_format,
        prepare_docword_data,
    )
    from textgcn_tpu.train.trainer import TrainConfig, Trainer

    pre = prepare_docword_data("R8", data_root="data")
    log(
        f"R8 docword: {pre.graph.n_nodes} nodes, {pre.graph.n_edges} edges"
    )
    res = {}
    for name, degree_sort in (("onehot", False), ("hybrid", True)):
        pre_k = apply_attention_format(pre, degree_sort=degree_sort)
        log(f"{name}: plan n_sc={pre_k.graph.fwd.n_sc} k={pre_k.graph.fwd.k}")
        res[name] = run_one(pre_k, name)
    res["segment"] = run_one(pre, "segment")
    res["speedup_onehot"] = (
        res["segment"]["s_per_epoch"] / res["onehot"]["s_per_epoch"]
    )
    res["speedup_hybrid"] = (
        res["segment"]["s_per_epoch"] / res["hybrid"]["s_per_epoch"]
    )
    print(json.dumps(res), flush=True)


def run_one(pre, name):
    from textgcn_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        n_hidden=200,
        max_epoch=10,
        early_stopping=100,
        dropout=0.5,
        seed=0,
        epoch_block=5,
        model="gat",
    )
    labels = pre.labels
    t = Trainer(
        pre.graph,
        pre.features,
        labels.target,
        labels.train_idx,
        labels.test_idx,
        len(labels.label_names),
        config=cfg,
    )
    t0 = time.perf_counter()
    t.fit(verbose=False)
    warm = time.perf_counter() - t0  # includes compile
    cfg2 = TrainConfig(
        n_hidden=200, max_epoch=20, early_stopping=100, dropout=0.5,
        seed=0, epoch_block=5, model="gat",
    )
    t2 = Trainer(
        pre.graph, pre.features, labels.target, labels.train_idx,
        labels.test_idx, len(labels.label_names), config=cfg2,
    )
    t0 = time.perf_counter()
    t2.fit(verbose=False)
    dt = time.perf_counter() - t0
    per_epoch = (dt - 0) / 20.0
    test = t2.test()
    log(
        f"{name}: {per_epoch * 1e3:.1f} ms/epoch (20-epoch fit {dt:.1f}s, "
        f"first fit+compile {warm:.1f}s) loss={t2.history[-1]['train_loss']:.4f} "
        f"acc={test['acc']:.4f}"
    )
    return {
        "s_per_epoch": per_epoch,
        "final_train_loss": float(t2.history[-1]["train_loss"]),
        "test_acc": float(test["acc"]),
    }


if __name__ == "__main__":
    main()
