#!/usr/bin/env python
"""A/B reconciliation of the headline frontier-round protocol.

Round 2's last commit switched the headline bench's corpus access from an
on-heap .cache() to a tmpfs-parquet re-scan, claiming 2-4x faster seed
phase; the driver's post-commit run measured the opposite (fetch_extract
29->90 s). This script settles it at the driver's exact configuration:
local[32], n_pages=120k, heap_gb_for_round heap, fresh subprocess per rep,
INTERLEAVED scan/cache reps so slow-JVM-placement luck (the known bimodal
failure mode on this box) cannot land on one arm only.

Run: python tools/bench_ab.py [reps]   (default 3 per arm)
Writes per-rep JSON lines to stdout and a summary at the end.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = 120_000


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import bench

    # materialize the corpus once (untimed, separate process)
    from pyspark.sql import SparkSession  # noqa: F401 - env check only

    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--gen-corpus",
         os.path.join(bench._fast_tmp(), "bench_ab_corpus.parquet"),
         "--n-pages", str(N_PAGES)],
        check=True,
    )
    assert gen.returncode == 0
    corpus = os.path.join(bench._fast_tmp(), "bench_ab_corpus.parquet")

    results: dict[str, list[dict]] = {"scan": [], "cache": []}
    for r in range(reps):
        for arm in ("scan", "cache"):
            cmd = [sys.executable, os.path.join(REPO, "bench.py"),
                   "--frontier-level", "32", "--corpus", corpus,
                   "--n-pages", str(N_PAGES)]
            if arm == "cache":
                cmd.append("--cache-corpus")
            time.sleep(15)
            pr = subprocess.run(cmd, capture_output=True, text=True)
            if pr.returncode != 0:
                print(pr.stderr[-3000:], file=sys.stderr)
                raise RuntimeError(f"{arm} rep {r} failed")
            line = [l for l in pr.stdout.splitlines()
                    if l.startswith("FRONTIER_RESULT ")][-1]
            res = json.loads(line[len("FRONTIER_RESULT "):])
            res["arm"], res["rep"] = arm, r
            results[arm].append(res)
            print(json.dumps({k: res[k] for k in
                              ("arm", "rep", "sec", "phases")}), flush=True)

    summary = {}
    for arm, rr in results.items():
        secs = [x["sec"] for x in rr]
        summary[arm] = {
            "secs": secs,
            "median": round(statistics.median(secs), 2),
            "best": round(min(secs), 2),
            "median_phases": {
                ph: round(statistics.median(x["phases"].get(ph, 0.0) for x in rr), 2)
                for ph in rr[0]["phases"]
            },
        }
    print("AB_SUMMARY " + json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
