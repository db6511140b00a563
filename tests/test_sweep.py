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


@pytest.mark.sweep
def test_full_selfcheck_sweep_sf001():
    """Every registered query matches its DuckDB oracle (or its rows-only
    contract) at sf0.01 — the same gate the round driver runs."""
    sf_dir = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"no test data at {sf_dir}")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "selfcheck.py"), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, (
        f"selfcheck sweep failed (exit {proc.returncode}):\n{tail}\n"
        f"stderr tail:\n{chr(10).join(proc.stderr.splitlines()[-10:])}"
    )
    assert "passing" in proc.stdout
