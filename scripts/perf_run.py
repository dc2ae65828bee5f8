"""One-process perf measurement run (dev aid, not the driver bench).

Runs the bench perf phases back-to-back in a single process so the
~100 s TPU tunnel acquisition is paid once, writing progress lines and
the final perf dict to results/perf_bench.json exactly as bench.py's
perf section would.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench  # noqa: E402
from bench import log  # noqa: E402


def main() -> int:
    t0 = time.time()
    perf = bench.docword_perf("R8")
    log(f"[perf_run] docword_perf done at {time.time() - t0:.0f}s")
    try:
        perf["streamed_scale"] = bench.streamed_scale_perf()
        gw = perf["roofline"]["gather_rows_per_s"]
        perf["streamed_scale"]["fraction_of_bound"] = perf["streamed_scale"][
            "edges_per_s"
        ] / (gw / 2.0)
    except Exception as e:
        log(f"[perf_run] streamed scale failed: {e!r}")
    try:
        perf["streamed_mesh_scale"] = bench.streamed_mesh_scale_perf()
        if "streamed_scale" in perf:
            perf["streamed_mesh_scale"]["vs_single_chip_streamed"] = (
                perf["streamed_mesh_scale"]["edges_per_s_per_shard"]
                / perf["streamed_scale"]["edges_per_s"]
            )
    except Exception as e:
        log(f"[perf_run] streamed mesh scale failed: {e!r}")
    try:
        perf["streamed_sgc_train"] = bench.streamed_sgc_train_perf()
    except Exception as e:
        log(f"[perf_run] streamed SGC train failed: {e!r}")
    try:
        perf["streamed_train"] = bench.streamed_train_perf()
    except Exception as e:
        log(f"[perf_run] streamed train failed: {e!r}")
    with open(
        os.path.join("results", "perf_bench.json"), "w", encoding="utf-8"
    ) as f:
        json.dump(perf, f, indent=2)
    log(f"[perf_run] total {time.time() - t0:.0f}s — wrote results/perf_bench.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
