"""CPU smoke tests for bench.py's driver-captured perf phases.

The driver runs bench.py once per round on the real chip; a crash in a
perf phase silently drops the round's perf evidence (the headline JSON is
emitted first, so only the perf record is lost). These tests execute the
same functions at tiny sizes on the CPU backend (Pallas interpret mode) so
API breakage is caught in CI, not at driver time."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from textgcn_tpu.graph.normalize import sym_normalize_coo  # noqa: E402
from textgcn_tpu.graph.structs import SparseGraph  # noqa: E402
from textgcn_tpu.text.datasets import DatasetLabels  # noqa: E402
from textgcn_tpu.train.prepare import PreparedData  # noqa: E402


def _pre(n=600, seed=0):
    rng = np.random.RandomState(seed)
    hub = rng.randint(0, 100, (3000, 2))
    uni = rng.randint(0, n, (2000, 2))
    rc = np.vstack([hub, uni])
    row = np.r_[rc[:, 0], rc[:, 1]]
    col = np.r_[rc[:, 1], rc[:, 0]]
    r, c, v = sym_normalize_coo(row, col, np.ones_like(row, float), n)
    g = SparseGraph.from_coo(r, c, v, n, pad_to_multiple=256)
    y = rng.randint(0, 3, n)
    idx = rng.permutation(n)
    labels = DatasetLabels(
        target=y, label_names=["a", "b", "c"],
        train_idx=idx[: n // 2], test_idx=idx[n // 2:],
    )
    return PreparedData(
        graph=g, features=None, labels=labels, n_feat=n,
        num_docs=n, num_topics=0,
    )


def test_roofline_probe_smoke():
    probe = bench.roofline_probe(n=1 << 18, nt=4096, ng=20_000)
    assert probe["hbm_stream_gbps"] > 0
    assert probe["gather_rows_per_s"] > 0
    assert probe["gather_gbps"] > 0


def test_kernel_pass_perf_smoke():
    probe = {"hbm_stream_gbps": 100.0, "gather_rows_per_s": 1e8,
             "gather_gbps": 50.0}
    out = bench.kernel_pass_perf(_pre(), probe, f=16, reps=1)
    for fmt in ("segment", "onehot", "hybrid"):
        rec = out[fmt]
        assert rec["pass_ms"] > 0
        assert rec["edges_per_s"] > 0
        assert rec["fraction_of_bound"] > 0
        assert "bound_model" in rec and "bound_ms" in rec
    assert out["hybrid"]["bsr_bytes_per_pass"] > 0


def test_mesh_kernel_perf_smoke():
    out = bench.mesh_kernel_perf(_pre(seed=1), f=16, reps=1)
    for key in ("halo_onehot", "allgather_hybrid"):
        assert out[key]["pass_ms"] > 0
        assert out[key]["edges_per_s_per_shard"] > 0
    assert 0 < out["allgather_hybrid"]["dense_fraction"] <= 1


def test_streamed_mesh_scale_perf_smoke(monkeypatch):
    """The streamed-mesh bench phase (parallel/streamed.py at P=1) runs at
    tiny size — API breakage in the composed scale path is caught here,
    not at driver time."""
    res = bench.streamed_mesh_scale_perf(n=2048, deg=4, f=16, chunk=2048)
    assert res["n_shards"] == 1
    assert res["edges_per_s_per_shard"] > 0


def test_streamed_sgc_train_perf_smoke():
    res = bench.streamed_sgc_train_perf(
        n=2048, deg=4, f=16, c=4, chunk=2048
    )
    assert np.isfinite(res["loss"])
    assert res["s_per_step"] > 0


def test_synthetic_large_mesh_stream_smoke(capsys):
    """benchmarks/synthetic_large.py --mesh_stream end-to-end at tiny
    size on the virtual mesh (both phases emit their JSON lines)."""
    import json as _json

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks",
        ),
    )
    import synthetic_large

    sys.argv = [
        "synthetic_large", "--mesh_stream", "--n", "1024", "--deg", "4",
        "--f", "16", "--hidden", "8", "--classes", "4", "--chunk",
        "16384", "--shards", "4",
    ]
    assert synthetic_large.main() == 0
    lines = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    phases = {r["phase"] for r in lines}
    assert "spmm_streamed_mesh" in phases
    assert "train_step_streamed_mesh_gcn" in phases
