"""ANN recall@3 at the 100× vector tier, with statistical teeth.

bench.py's standing recall section measures every ANN rung at sf0.01
(2k vectors); the SELFCHECK sf10 tier runs three rungs at 200k vectors
but rows-only — no recall number. IVF's fixed cell count (n_cells=16 →
12.5k vectors/cell at 200k) and BQ's 1-bit Hamming resolution both
interact with corpus size, so the small-scale recall figures must be
shown not to collapse at 100× the vectors. r13 proved the point: the
refine=8 PQ/IVFPQ shortlist read recall@3 = 0.6 here while every
smaller tier read ≥0.967.

r14 (r13 verdict finding #1): the r13 run used 10 query vectors / 30
ground-truth pairs — recall 1.0 over 30 pairs is consistent with true
recall as low as ~0.9 (0.9³⁰ ≈ 4%), and `vec_id < 10` is a
head-of-corpus probe, not a random one. The query set is now a SEEDED
HASH SAMPLE of the corpus (crc32(vec_id) ≡ QUERY_RES mod QUERY_MOD →
~200 queries at 200k vectors, ≥600 ground-truth pairs; the tool
REFUSES to report on fewer), and every rung dispatches through
plans.ml_queries.ann_rung_topk — the same production parameters the
registry entries run, by construction. The exact ground truth is
ml.similarity.cosine_topk's brute-force broadcast scan (~20× the r13
cost — a few minutes once per round).

Floors are asserted here AND in the sweep gate (tests/test_sweep.py):
≥0.9 for the exact-re-rank quantized rungs (IVF/PQ/IVFPQ/SQ8), a
recorded-calibration floor for the 1-bit BQ rung and the bucket-recall
LSH rung.

Usage:
    python tools/ann_recall_100x.py [out_json]
    python tools/ann_recall_100x.py ANN_RECALL_100X_r14.json
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

#: seeded hash sample defining the query set: vec_ids with
#: crc32(str(vec_id)) ≡ QUERY_RES (mod QUERY_MOD). At the 200k-vector
#: tier this realizes 230 queries / 690 ground-truth pairs (hash-sample
#: variance around the 200k/887 ≈ 225 expectation; mod 997 realized
#: only 192 → 576 pairs and the ≥600 guard below refused to publish;
#: ANN_RECALL_100X_r14.json is the committed realization) spread
#: uniformly over the id space (exact/near/independent copy strata
#: alike — the stressgen corpus interleaves them by id).
#: Deterministic, so the artifact is reproducible; no RNG, so reruns
#: compare.
QUERY_MOD = 887
QUERY_RES = 13
#: refuse to publish a recall number on fewer pairs than this — the
#: whole point of the r14 rework (30 pairs could not distinguish
#: recall 1.0 from 0.9; 600 pairs bound true recall ≥ ~0.995 at an
#: observed 1.0, since 0.995^600 ≈ 5%).
MIN_GROUND_TRUTH_PAIRS = 600

#: recall@3 floors at 200k vectors. The quantized exact-re-rank rungs
#: must hold ≥0.9 (the r12 verdict's bar); LSH/BQ floors are set from
#: the r13 measurement at this tier with one measurement quantum of
#: slack — now 1/600 rather than 1/30, so the slack is effectively the
#: documented calibration margin, not noise cover.
FLOORS = {
    "emb_knn_ivf": 0.90,
    "emb_knn_pq": 0.90,
    "emb_knn_ivfpq": 0.90,
    "emb_knn_sq8": 0.90,
    "emb_knn_bq": 0.85,
    "emb_knn_lsh": 0.90,
}

#: r15 (r14 verdict finding #3): the SERVING path gets its own recall
#: legs at the same 200k tier — both recall bugs (r13 PQ, r14 SQ8) were
#: shortlist-parameter drift, and the pretrained entries were the one
#: place parameters were still hand-copied. They now route through
#: ann_rung_topk_pretrained reading the same ANN_RUNG_PARAMS as the
#: inline rungs (aliased dicts — cannot diverge), and these legs verify
#: the SERVED index artifact (write → JSON round-trip → probe) hits the
#: same floors as its inline twin. sq8/bq are bit-identical to inline
#: by construction; ivfpq shares the recall gate; ivf trains on a
#: crc32-parity half-sample so its recall is measured, not inherited.
PRETRAINED_FLOORS = {
    "emb_knn_ivf_pretrained": 0.90,
    "emb_knn_ivfpq_pretrained": 0.90,
    "emb_knn_sq8_pretrained": 0.90,
    "emb_knn_bq_pretrained": 0.85,
}

#: r16 (r15 verdict #2): the serving-path time gate, anchored to the
#: INLINE sibling measured in the SAME artifact rather than to a warm
#: calibration from another day. Serving skips training and reads a
#: pruned pre-encoded index, so structurally it costs ≤ ~1× inline
#: end-to-end; a plan regression (Exchange reintroduced on the probe
#: side, partition pruning lost) shows as ≥2×. Same-run anchoring also
#: makes the gate contention-honest: r15's artifact read ivfpq serve at
#: 2.33× inline, but the inline and pretrained legs run ~7 minutes
#: apart in this tool, and a same-box re-measurement (r16) read the
#: ratio at 0.55–0.8× — the 2.33 was cross-time box contention, which
#: the probe stamps below now make visible instead of deniable.
SERVE_INLINE_MAX_RATIO = 2.0


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
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.ml.similarity import cosine_topk
    from mempool_dumpster_spark.plans.ml_queries import ann_rung_topk

    emb = spark.read.parquet(os.path.join(SF10_DIR, "embeddings.parquet"))
    queries = emb.filter(
        F.crc32(F.col("vec_id").cast("string")) % QUERY_MOD == QUERY_RES
    ).cache()
    n_queries = queries.count()

    t0 = time.time()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=3).collect()
    }
    exact_sec = round(time.time() - t0, 1)
    if len(exact) < MIN_GROUND_TRUTH_PAIRS:
        raise SystemExit(
            f"ground truth has {len(exact)} pairs < required "
            f"{MIN_GROUND_TRUTH_PAIRS} — the recall number would have no "
            "statistical teeth; widen the query sample"
        )
    out: dict = {
        "n_vectors": emb.count(),
        "n_queries": n_queries,
        "query_sample": f"crc32(vec_id) % {QUERY_MOD} == {QUERY_RES}",
        "n_ground_truth_pairs": len(exact),
        "exact_sec": exact_sec,
        "recall_at3": {},
        "rung_sec": {},
    }
    # contention stamps (r16): bench.py's md5 probe pair convention,
    # applied to this tool — the inline and pretrained sections run
    # minutes apart, and r15 proved a rung timing read across that gap
    # can silently carry box contention into a committed artifact.
    import bench as _bench

    out["probes"] = {"inline_before": _bench._section_probe()}
    for name in FLOORS:
        t1 = time.time()
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_rung_topk(name, emb, queries).collect()
        }
        out["recall_at3"][name] = round(len(exact & approx) / len(exact), 4)
        out["rung_sec"][name] = round(time.time() - t1, 1)
    out["probes"]["between_sections"] = _bench._section_probe()

    from mempool_dumpster_spark.plans.ml_queries import (
        ann_rung_topk_pretrained,
    )
    from mempool_dumpster_spark.plans.timing import pop_build

    for name in PRETRAINED_FLOORS:
        t1 = time.time()
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_rung_topk_pretrained(
                name, spark, emb, queries, "recall100x"
            ).collect()
        }
        out["recall_at3"][name] = round(len(exact & approx) / len(exact), 4)
        wall = time.time() - t1
        build = pop_build(name) or 0.0
        out["rung_sec"][name] = round(wall, 1)
        out.setdefault("rung_build_sec", {})[name] = round(build, 1)
        out.setdefault("rung_serve_sec", {})[name] = round(wall - build, 1)
        inline = name[: -len("_pretrained")]
        if out["rung_sec"].get(inline):
            out.setdefault("serve_over_inline", {})[name] = round(
                (wall - build) / out["rung_sec"][inline], 2
            )
    out["probes"]["end"] = _bench._section_probe()
    queries.unpersist()
    return out


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    ensure_corpus()

    from mempool_dumpster_spark.session import get_spark

    spark = get_spark("ann-recall-100x")
    report = measure(spark)
    report["floors"] = {**FLOORS, **PRETRAINED_FLOORS}
    report["violations"] = [
        f"{name} recall@3 {report['recall_at3'][name]} < floor {floor}"
        for name, floor in report["floors"].items()
        if report["recall_at3"][name] < floor
    ]
    # serve/inline ratio gate (r16): fires only when the probe stamps
    # say the sections ran quiet — a contended artifact records the
    # contention by name instead of a phantom serving regression (the
    # exact bench.py gate-exclusion convention).
    report["serve_ratio_max"] = SERVE_INLINE_MAX_RATIO
    probes = report.get("probes") or {}
    probe_max = max(
        (p or {}).get("probe_scale") or 1.0 for p in probes.values()
    ) if probes else 1.0
    if probe_max > 2.0:
        report["serve_ratio_gate"] = (
            f"excluded: probe scale {probe_max} > 2.0 — box contended, "
            "rerun quiet for a gate-eligible ratio"
        )
    else:
        report["serve_ratio_gate"] = "gated"
        report["violations"] += [
            f"{name} serve/inline ratio {ratio} > "
            f"{SERVE_INLINE_MAX_RATIO} — serving-path regression"
            for name, ratio in (report.get("serve_over_inline") or {}).items()
            if ratio > SERVE_INLINE_MAX_RATIO
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
