"""ANN recall@3 at the 100× vector tier (r12 verdict #3).

bench.py's standing recall section measures every ANN rung at sf0.01
(2k vectors); the SELFCHECK sf10 tier runs three rungs at 200k vectors
but rows-only — no recall number. IVF's fixed cell count (n_cells=16 →
12.5k vectors/cell at 200k) and BQ's 1-bit Hamming resolution both
interact with corpus size, so the committed 0.967/0.933 figures must be
shown not to collapse at 100× the vectors.

This tool derives the deterministic 100× corpus (tools/stressgen.py —
the same 200k-vector embeddings the SELFCHECK sf10 tier uses), runs the
REGISTRY entries themselves (same nprobe/refine/n_cells as every other
tier — the point is to measure the production parameters at scale, not
parameters retuned to flatter the number) against the exact emb_knn
ground truth at the same dir, and writes ANN_RECALL_100X_r{N}.json,
which bench.py embeds by reference. Floors are asserted here AND in the
sweep gate (tests/test_sweep.py): ≥0.9 for the exact-re-rank quantized
rungs (IVF/PQ/IVFPQ/SQ8), a recorded-calibration floor for the 1-bit BQ
rung and the bucket-recall LSH rung.

Usage:
    python tools/ann_recall_100x.py [out_json]
    python tools/ann_recall_100x.py ANN_RECALL_100X_r13.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF10_DIR = "/tmp/spark_graft_sf10"

#: recall@3 floors at 200k vectors. The quantized exact-re-rank rungs
#: must hold ≥0.9 (verdict #3's bar); LSH/BQ floors are set from the r13
#: measurement at this tier minus one ground-truth-set quantum (1/30),
#: so a future collapse fires while measurement-noise does not.
FLOORS = {
    "emb_knn_ivf": 0.90,
    "emb_knn_pq": 0.90,
    "emb_knn_ivfpq": 0.90,
    "emb_knn_sq8": 0.90,
    "emb_knn_bq": 0.85,
    "emb_knn_lsh": 0.90,
}


def ensure_corpus() -> None:
    if os.path.exists(os.path.join(SF10_DIR, "embeddings.parquet")):
        return
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "stressgen.py"),
         "/root/testdata/sf0.1", SF10_DIR, "100"],
        cwd=REPO, timeout=3600,
    )
    if proc.returncode != 0:
        raise SystemExit("stressgen failed")


def measure(spark) -> dict:
    from mempool_dumpster_spark.plans.registry import all_queries

    qs = all_queries()
    t0 = time.time()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in qs["emb_knn"](spark, SF10_DIR).collect()
    }
    exact_sec = round(time.time() - t0, 1)
    if not exact:
        raise SystemExit("exact ground truth came back empty")
    out: dict = {
        "n_vectors": spark.read.parquet(
            os.path.join(SF10_DIR, "embeddings.parquet")
        ).count(),
        "n_ground_truth_pairs": len(exact),
        "exact_sec": exact_sec,
        "recall_at3": {},
        "rung_sec": {},
    }
    for name in FLOORS:
        t1 = time.time()
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in qs[name](spark, SF10_DIR).collect()
        }
        out["recall_at3"][name] = round(len(exact & approx) / len(exact), 3)
        out["rung_sec"][name] = round(time.time() - t1, 1)
    return out


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    ensure_corpus()

    from mempool_dumpster_spark.session import get_spark

    spark = get_spark("ann-recall-100x")
    report = measure(spark)
    report["floors"] = FLOORS
    report["violations"] = [
        f"{name} recall@3 {report['recall_at3'][name]} < floor {floor}"
        for name, floor in FLOORS.items()
        if report["recall_at3"][name] < floor
    ]
    report["pass"] = not report["violations"]
    print(json.dumps(report))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
    spark.stop()
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
