"""One command reproduces every committed SELFCHECK tier (r11 verdict #7,
r10 #6): the two standard-scale full-registry sweeps PLUS the derived
stress tiers, including corpus generation — nothing manual left.

    python tools/sweep_all.py r12                 # sf0.01 + sf0.1 + 10x
    python tools/sweep_all.py r12 --tiers 0.01,0.1,1,10   # + the 100x tier

Tiers (artifact name → what runs):
  0.01  SELFCHECK_<tag>_sf0.01.json — full registry vs DuckDB at sf0.01
        (the driver's own gate shape)
  0.1   SELFCHECK_<tag>_sf0.1.json — full registry at 10× the rows (the
        scale sweep that caught r5's two true scale bugs)
  1     SELFCHECK_<tag>_sf1.json — tools/stressgen.py derives the
        deterministic 10×-sf0.1 corpus under /tmp if absent, then the
        STRESS_QUERIES set (tests/test_sweep.py — single source of
        truth) runs against the oracle; emb_semantic_dedup demotes to
        rows-only (its oracle is the quadratic all-pairs definition).
  10    SELFCHECK_<tag>_sf10.json — the 100×-sf0.1 corpus (500k docs)
        and the SF10_QUERIES subset: the entries whose ORACLES still
        terminate at that scale (docs_bpe_encode demotes to rows-only —
        its string-rebuild oracle exhausts DuckDB at 100×, which is why
        the digest twin exists and stays exact).

Each tier is an isolated subprocess (fresh Spark session, fresh DuckDB),
exactly as the driver and the pytest sweep gates run them. Exit is
nonzero on the first failing tier; artifacts land in the repo root.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_sweep import STRESS_QUERIES  # noqa: E402  (single source of truth)

#: the 100×-tier set (r10; SELFCHECK_r10_sf10): every entry whose DuckDB
#: oracle still terminates on the 500k-doc corpus, plus the rows-only
#: riders whose Spark side must survive the scale. docs_bpe_encode is
#: forced rows-only HERE (not in the registry): the instance-level
#: string-rebuild oracle is the part that dies at 100×, the Spark side
#: is fine — and its digest twin stays exact as the hash evidence.
SF10_QUERIES = [
    "docs_boilerplate", "docs_bpe_encode", "docs_bpe_encode_digest",
    "docs_dsir_sample", "docs_langid", "docs_nb_classify",
    "docs_ngram_lm_score", "docs_soft_dedup_weights",
    "docs_wordpiece_encode", "emb_knn_bq", "emb_knn_ivf", "emb_knn_sq8",
]


def _run(cmd: list[str], env: dict | None = None, timeout: int = 7200) -> None:
    t0 = time.time()
    print(f"$ {' '.join(cmd)}", flush=True)
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    print(tail, flush=True)
    print(f"  ({time.time() - t0:.0f}s)", flush=True)
    if proc.returncode != 0:
        raise SystemExit(
            f"tier command failed (exit {proc.returncode}): {' '.join(cmd)}"
        )


def _ensure_corpus(out: str, factor: str) -> None:
    if os.path.exists(os.path.join(out, "documents.parquet")):
        return
    _run([sys.executable, os.path.join(REPO, "tools", "stressgen.py"),
          "/root/testdata/sf0.1", out, factor], timeout=3600)


def _selfcheck(sf_dir: str, artifact: str, names: list[str] | None = None,
               rows_only: str | None = None) -> None:
    env = dict(os.environ, SELFCHECK_JSON=os.path.join(REPO, artifact))
    if rows_only:
        env["SELFCHECK_ROWS_ONLY"] = rows_only
    _run(
        [sys.executable, os.path.join(REPO, "tools", "selfcheck.py"), sf_dir]
        + (names or []),
        env=env,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", help="artifact tag, e.g. r12")
    ap.add_argument(
        "--tiers", default="0.01,0.1,1",
        help="comma list from {0.01, 0.1, 1, 10}; the 100× tier (10) is "
        "opt-in — it takes ~25 min of DuckDB oracle time alone",
    )
    args = ap.parse_args()
    tiers = [t.strip() for t in args.tiers.split(",") if t.strip()]
    bad = [t for t in tiers if t not in {"0.01", "0.1", "1", "10"}]
    if bad:
        raise SystemExit(f"unknown tiers: {bad}")

    t0 = time.time()
    for tier in tiers:
        if tier in ("0.01", "0.1"):
            _selfcheck(
                f"/root/testdata/sf{tier}",
                f"SELFCHECK_{args.tag}_sf{tier}.json",
            )
        elif tier == "1":
            out = "/tmp/spark_graft_sf1"
            _ensure_corpus(out, "10")
            _selfcheck(out, f"SELFCHECK_{args.tag}_sf1.json",
                       names=STRESS_QUERIES,
                       rows_only="emb_semantic_dedup")
        else:  # "10"
            out = "/tmp/spark_graft_sf10"
            _ensure_corpus(out, "100")
            _selfcheck(out, f"SELFCHECK_{args.tag}_sf10.json",
                       names=SF10_QUERIES,
                       rows_only="docs_bpe_encode")
    print(f"all tiers green in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
