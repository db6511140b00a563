"""The full oracle selfcheck sweep as a pytest-visible gate.

The 90-query sf0.01 sweep (tools/selfcheck.py) has caught every true
scale bug for three rounds, but it lived outside pytest — a refactor
could silently stop running it. `pytest -m sweep` now executes it
end-to-end; the default test run skips it (see pytest.ini addopts).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_sweep(sf_dir: str) -> None:
    if not os.path.isdir(sf_dir):
        pytest.skip(f"no test data at {sf_dir}")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "selfcheck.py"), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, (
        f"selfcheck sweep failed (exit {proc.returncode}):\n{tail}\n"
        f"stderr tail:\n{chr(10).join(proc.stderr.splitlines()[-10:])}"
    )
    assert "passing" in proc.stdout


@pytest.mark.sweep
def test_full_selfcheck_sweep_sf001():
    """Every registered query matches its DuckDB oracle (or its rows-only
    contract) at sf0.01 — the same gate the round driver runs."""
    _run_sweep(os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01"))


@pytest.mark.sweep
def test_full_selfcheck_sweep_sf01():
    """The same gate at sf0.1 (10× the rows): the scale sweep has caught
    every true scale bug — r5's two, via lineage growth and an LSH
    near-miss — so it is pinned as a pytest gate alongside sf0.01
    instead of living only in the round ledger. Skips when the sf0.1
    directory isn't present."""
    _run_sweep("/root/testdata/sf0.1")
