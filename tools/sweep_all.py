"""One command reproduces every committed SELFCHECK tier (r11 verdict #7,
r10 #6): the two standard-scale full-registry sweeps PLUS the derived
stress tiers, including corpus generation — nothing manual left.

    python tools/sweep_all.py r13                 # sf0.01 + sf0.1 + 10x
    python tools/sweep_all.py r13 --tiers 0.01,0.1,1,10   # + the 100x tier
    python tools/sweep_all.py r13 --dry-run       # print disk projections only
    python tools/sweep_all.py r13 --keep          # leave derived corpora

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
        terminate at that scale. Two honest demotions to rows-only,
        both oracle-side (the Spark side runs fine and stays checked
        exact at sf1): docs_bpe_encode — its string-rebuild oracle
        exhausts DuckDB at 100× (why the digest twin exists and stays
        exact) — and docs_incremental_dedup (r13) — its signature-
        chain oracle spills past the machine's free disk (>79 GB) at
        500k docs. Entries run ONE PER SUBPROCESS here (see
        _selfcheck's chunk note).

Disk awareness (r12 verdict #5 — the 40 M-receipt merge tier showed disk
is now the binding constraint): before each tier this prints the free-
bytes headroom and a projected footprint (derived corpus bytes scaled
from the base fixtures + a scratch allowance for the DuckDB oracle and
Spark local dirs), REFUSES to start a tier whose projection exceeds
free − margin, and — unless --keep — removes the derived corpora it
created (never ones that already existed; a re-run reusing a cached
corpus leaves it alone). --dry-run prints the projections and exits.

Each tier is an isolated subprocess (fresh Spark session, fresh DuckDB),
exactly as the driver and the pytest sweep gates run them. Exit is
nonzero on the first failing tier; artifacts land in the repo root.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_sweep import STRESS_QUERIES  # noqa: E402  (single source of truth)

#: the 100×-tier set: every entry whose DuckDB oracle still terminates on
#: the 500k-doc corpus, plus the rows-only riders whose Spark side must
#: survive the scale. docs_bpe_encode is forced rows-only HERE (not in
#: the registry): the instance-level string-rebuild oracle is the part
#: that dies at 100×, the Spark side is fine — and its digest twin stays
#: exact as the hash evidence. r13 (r12 verdict #6) adds the five
#: corpus-scale operators whose oracles are linear in the corpus:
#: span-strip, decontaminate, incremental dedup, novelty, contamination
#: report.
SF10_QUERIES = [
    "docs_boilerplate", "docs_bpe_encode", "docs_bpe_encode_digest",
    "docs_contamination_report", "docs_decontaminate",
    "docs_dsir_sample", "docs_dup_span_strip", "docs_incremental_dedup",
    "docs_langid", "docs_nb_classify",
    "docs_ngram_lm_score", "docs_ngram_novelty", "docs_soft_dedup_weights",
    "docs_wordpiece_encode", "emb_knn_bq", "emb_knn_ivf", "emb_knn_sq8",
    # r13 widening (enabled by the per-entry process isolation below —
    # the old single-session form hit the jemalloc VMA ceiling at 17):
    # the LSH-verified Jaccard near-dup entry plus the linear-oracle
    # text/selection surface, all exact at this scale.
    # docs_minhash_lsh_pairs was attempted and EXCLUDED: its oracle
    # recomputes the full 64-slot signature chain from the shingle
    # explode and spilled past 53 GB (heading for the disk) at 500k
    # docs — the same oracle-infeasibility class as the
    # docs_incremental_dedup demotion; the family keeps 100× coverage
    # through docs_ngram_jaccard below (candidate-bounded exact verify).
    "docs_ngram_jaccard", "docs_repetition",
    # r14 (r13 verdict #4): the signature-chain digest twin — linear
    # oracle (one shingle explode + 8 mins + md5), so the MinHash
    # family's 100× coverage is exact-hash again instead of riding on
    # docs_ngram_jaccard alone.
    "docs_minhash_sig_digest",
    "docs_gopher_rules", "docs_redact_pii", "docs_tfidf_terms",
    "docs_token_stats", "docs_quality_curriculum",
    # r15 (r14 verdict #6): the last two heavyweight families without
    # 100× exact-hash coverage get their digest twins — emb_near_pairs'
    # LSH bucket-signature stage (pairs oracle quadratic) and the
    # ExactSubstr span family's positional-gram stage (frequent-gram
    # join oracle spill-heavy). Both oracles are LINEAR in the corpus.
    "emb_bucket_sig_digest", "docs_gram_fingerprint_digest",
    # r16 (r15 verdict #4): the cross-corpus incremental-dedup digest
    # twin — the full gate chain (signatures → exact anti → band join →
    # estimate threshold → anti) at 8 slots / 2×4 banding, the width
    # whose oracle stays linear here; folds to 16 bucket digests. With
    # it, BOTH remaining rows-only entries (docs_bpe_encode,
    # docs_incremental_dedup) are raw-instance entries whose families
    # carry exact-hash 100× evidence through a digest twin in the same
    # artifact — the rows-only rider only adds Spark-side
    # does-it-survive-the-scale coverage for the production-width
    # parameters. That is this sweep's standing shape, not a gap.
    "docs_incremental_dedup_digest",
]

#: scratch allowance per derived-corpus tier, as a multiple of the
#: projected corpus bytes: the DuckDB oracle materializes shingle
#: self-joins and Spark spills shuffle locally — observed peak scratch
#: on the sf10 tier is well under 20× the ~100 MB corpus, so 20× is the
#: refuse-early cushion.
SCRATCH_MULTIPLE = 20
#: absolute floor margin left free no matter what (bytes) — one
#: oversized run away from ENOSPC mid-sweep is exactly the failure mode
#: this exists to prevent (SCALE.md: the 40 M merge tier peaked ~58 GB
#: of ~80 GB free).
FLOOR_MARGIN = 5 * 1024**3

BASE_SF = "/root/testdata/sf0.1"
DERIVED = {"1": ("/tmp/spark_graft_sf1", 10), "10": ("/tmp/spark_graft_sf10", 100)}


def tier_projection(tier: str, base_sf: str = BASE_SF) -> dict:
    """Projected disk footprint for a tier, in bytes. Standard tiers
    (0.01/0.1) read committed fixtures and only need oracle scratch;
    derived tiers add factor× the base documents+embeddings plus the
    copied side tables (tools/stressgen.py's layout)."""
    if tier not in DERIVED:
        # committed fixtures, oracle scratch only — the floor margin in
        # check_headroom is the whole requirement
        return {"tier": tier, "corpus_bytes": 0, "projected_bytes": 0}
    out, factor = DERIVED[tier]
    scaled = sum(
        os.path.getsize(os.path.join(base_sf, f"{t}.parquet"))
        for t in ("documents", "embeddings")
        if os.path.exists(os.path.join(base_sf, f"{t}.parquet"))
    )
    copied = sum(
        os.path.getsize(os.path.join(base_sf, f))
        for f in os.listdir(base_sf)
        if f.endswith(".parquet")
        and not f.startswith(("documents", "embeddings"))
    )
    corpus = scaled * factor + copied
    already = os.path.exists(os.path.join(out, "documents.parquet"))
    return {
        "tier": tier,
        "corpus_bytes": 0 if already else corpus,
        "projected_bytes": (0 if already else corpus)
        + corpus * SCRATCH_MULTIPLE,
        "corpus_cached": already,
        "out": out,
    }


def check_headroom(projection: dict, free_bytes: int,
                   floor_margin: int = FLOOR_MARGIN) -> str | None:
    """None if the tier fits, else the refusal message. Pure logic so
    the test can exercise the refusal without filling a disk."""
    need = projection["projected_bytes"] + floor_margin
    if free_bytes < need:
        return (
            f"tier {projection['tier']}: projected footprint "
            f"{projection['projected_bytes'] / 1e9:.1f} GB + "
            f"{floor_margin / 1e9:.1f} GB margin exceeds free "
            f"{free_bytes / 1e9:.1f} GB — refusing to start "
            f"(free space up or run with a smaller tier set)"
        )
    return None


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


def _ensure_corpus(out: str, factor: str, created: list[str]) -> None:
    if os.path.exists(os.path.join(out, "documents.parquet")):
        return
    created.append(out)
    _run([sys.executable, os.path.join(REPO, "tools", "stressgen.py"),
          BASE_SF, out, factor], timeout=3600)


def _selfcheck(sf_dir: str, artifact: str, names: list[str] | None = None,
               rows_only: str | None = None, chunk: int = 0) -> None:
    """Run tools/selfcheck.py over `names` (or the full registry),
    writing `artifact`. chunk>0 splits `names` into groups of that size,
    each in a FRESH subprocess appending to the same artifact
    (SELFCHECK_APPEND): DuckDB's bundled jemalloc retains purged virtual
    mappings for the life of the process, so one process running many
    500k-doc oracles exhausts the kernel's vm.max_map_count (~65k VMAs)
    and malloc fails with RAM to spare — process rotation resets the
    map table. Diagnosed r13 on the 17-entry 100× tier; a SINGLE heavy
    oracle (docs_decontaminate's n-gram join churn) retains enough
    address space to starve the NEXT one, so the stress tier runs
    chunk=1 — every entry in its own process (each passes in
    isolation; ~30 s session setup per entry is the price of
    determinism at this tier)."""
    env = dict(os.environ, SELFCHECK_JSON=os.path.join(REPO, artifact))
    if rows_only:
        env["SELFCHECK_ROWS_ONLY"] = rows_only
    base = [sys.executable, os.path.join(REPO, "tools", "selfcheck.py"),
            sf_dir]
    if not chunk or not names:
        _run(base + (names or []), env=env)
        return
    path = os.path.join(REPO, artifact)
    if os.path.exists(path):
        os.remove(path)  # append mode must start from a clean artifact
    env["SELFCHECK_APPEND"] = "1"
    for i in range(0, len(names), chunk):
        _run(base + names[i:i + chunk], env=env)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", help="artifact tag, e.g. r13")
    ap.add_argument(
        "--tiers", default="0.01,0.1,1",
        help="comma list from {0.01, 0.1, 1, 10}; the 100× tier (10) is "
        "opt-in — it takes ~25 min of DuckDB oracle time alone",
    )
    ap.add_argument(
        "--keep", action="store_true",
        help="leave derived corpora this run created under /tmp "
        "(default: clean them after a fully-green sweep; corpora that "
        "already existed are never touched)",
    )
    ap.add_argument(
        "--dry-run", action="store_true",
        help="print per-tier disk projections and exit without running",
    )
    args = ap.parse_args()
    tiers = [t.strip() for t in args.tiers.split(",") if t.strip()]
    bad = [t for t in tiers if t not in {"0.01", "0.1", "1", "10"}]
    if bad:
        raise SystemExit(f"unknown tiers: {bad}")

    for tier in tiers:
        proj = tier_projection(tier)
        free = shutil.disk_usage("/tmp").free
        print(
            f"tier {tier}: free {free / 1e9:.1f} GB, projected "
            f"{proj['projected_bytes'] / 1e9:.2f} GB"
            + (" (corpus cached)" if proj.get("corpus_cached") else ""),
            flush=True,
        )
        refusal = check_headroom(proj, free)
        if refusal:
            raise SystemExit(refusal)
    if args.dry_run:
        return 0

    created: list[str] = []
    t0 = time.time()
    for tier in tiers:
        refusal = check_headroom(
            tier_projection(tier), shutil.disk_usage("/tmp").free
        )
        if refusal:
            raise SystemExit(refusal)
        if tier in ("0.01", "0.1"):
            _selfcheck(
                f"/root/testdata/sf{tier}",
                f"SELFCHECK_{args.tag}_sf{tier}.json",
            )
        elif tier == "1":
            out, _f = DERIVED[tier]
            _ensure_corpus(out, "10", created)
            _selfcheck(out, f"SELFCHECK_{args.tag}_sf1.json",
                       names=STRESS_QUERIES,
                       rows_only="emb_semantic_dedup")
        else:  # "10"
            out, _f = DERIVED[tier]
            _ensure_corpus(out, "100", created)
            _selfcheck(out, f"SELFCHECK_{args.tag}_sf10.json",
                       names=SF10_QUERIES,
                       rows_only="docs_bpe_encode,docs_incremental_dedup",
                       chunk=1)
    if not args.keep:
        for out in created:
            shutil.rmtree(out, ignore_errors=True)
            print(f"cleaned derived corpus {out}", flush=True)
    elif created:
        print(f"kept derived corpora: {', '.join(created)}", flush=True)
    print(f"all tiers green in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
