"""On-chip hybrid-kernel probe (dev aid for the >=70%-of-bound target).

Measures, on the R8 docword graph with the chained single-dispatch timing
bench.py uses: the roofline bounds, the three kernel passes, a BSR-leg
group-size sweep, and the P=1 mesh hybrid. Writes results/hybrid_probe.json.

Run from the repo root: nohup python scripts/hybrid_probe.py > /tmp/hp.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from bench import log, time_chained  # noqa: E402


def group_sweep(pre, probe, f: int = 200, reps: int = 16) -> dict:
    """Hybrid pass time with the BSR leg's group size forced."""
    import jax
    import jax.numpy as jnp

    from textgcn_tpu.graph.reorder import (
        HybridGraph,
        degree_sort_permutation,
        permute_coo,
        spmm_hybrid,
    )

    e = pre.graph.n_edges
    row = np.asarray(pre.graph.row)[:e]
    col = np.asarray(pre.graph.col)[:e]
    val = np.asarray(pre.graph.val)[:e]
    perm = degree_sort_permutation(row, col, pre.graph.n_nodes)
    r2, c2, v2 = permute_coo(row, col, val, perm)
    n = pre.graph.n_nodes
    x = jax.jit(lambda k: jax.random.normal(k, (n, f), jnp.float32))(
        jax.random.PRNGKey(11)
    )
    out = {}
    for grp in (None, 2, 4, 8, 16):
        h = HybridGraph.from_coo(r2, c2, v2, n, symmetric=True, group=grp)
        from textgcn_tpu.ops.pallas_spmm import GroupedBSR

        g_eff = h.bsr.group if isinstance(h.bsr, GroupedBSR) else 1
        n_steps = h.bsr.blocks.shape[0]
        dt, _ = time_chained(
            lambda i, v, hh: spmm_hybrid(hh, v), x, reps, consts=(h,)
        )
        hb = bench._hybrid_bound_bytes(h, ((f + 127) // 128) * 128)
        bound_t = hb["bsr_bytes_per_pass"] / (
            probe["hbm_stream_gbps"] * 1e9
        ) + hb["rest_edges"] / probe["gather_rows_per_s"]
        key = f"group_{'auto' if grp is None else grp}"
        out[key] = {
            "group_effective": int(g_eff),
            "grid_steps": int(n_steps),
            "pass_ms": dt * 1e3,
            "bound_ms": bound_t * 1e3,
            "fraction_of_bound": bound_t / dt,
            "bsr_bytes_per_pass": hb["bsr_bytes_per_pass"],
            "rest_edges": hb["rest_edges"],
        }
        log(
            f"[probe] {key}: G={g_eff} steps={n_steps} "
            f"{dt * 1e3:.2f} ms/pass = "
            f"{bound_t / dt * 100:.0f}% of bound ({bound_t * 1e3:.2f} ms)"
        )
    return out


def main() -> int:
    t0 = time.time()
    from textgcn_tpu.train.prepare import prepare_docword_data

    pre = prepare_docword_data("R8", data_root="data")
    log(f"[probe] graph ready at {time.time() - t0:.0f}s")
    probe = bench.roofline_probe()
    res = {"roofline": probe}
    res["kernel_pass"] = bench.kernel_pass_perf(pre, probe)
    res["group_sweep"] = group_sweep(pre, probe)
    res["mesh_kernel"] = bench.mesh_kernel_perf(pre)
    res["mesh_kernel"]["allgather_hybrid"]["vs_single_chip_hybrid_pass"] = (
        res["mesh_kernel"]["allgather_hybrid"]["edges_per_s_per_shard"]
        / res["kernel_pass"]["hybrid"]["edges_per_s"]
    )
    with open("results/hybrid_probe.json", "w", encoding="utf-8") as fh:
        json.dump(res, fh, indent=2)
    log(f"[probe] total {time.time() - t0:.0f}s — wrote results/hybrid_probe.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
