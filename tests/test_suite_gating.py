"""Guards for the r13 driver-budget test tiering (pytest.ini addopts +
the slow ledger + the parity smoke sample): the gating must never rot
into silently-skipped coverage."""

from __future__ import annotations

import os
import subprocess
import sys

from tests.conftest import _slow_ledger

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def test_no_stale_entries_in_slow_ledger():
    """Every slow_tests.txt entry must resolve to a collected test — a
    renamed test would otherwise silently fall back into the default
    (budgeted) run or, worse, vanish from -m slow."""
    out = subprocess.run(
        [
            sys.executable, "-m", "pytest", TESTS_DIR,
            "--collect-only", "-q", "-m", "",
            "-p", "no:cacheprovider",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(TESTS_DIR),
    )
    collected = {
        line.split("[", 1)[0].split("/")[-1]
        for line in out.stdout.splitlines()
        if "::" in line
    }
    missing = {e for e in _slow_ledger() if e not in collected}
    assert not missing, f"stale slow_tests.txt entries: {sorted(missing)}"


def test_default_run_deselects_slow_and_parity():
    """The pytest.ini addopts must keep the driver-budget default: a
    collect-only default run may not pick up slow- or parity-marked
    items (a deleted pytest.ini would silently restore the 45-minute
    suite and re-redden the driver's tests_ok bit)."""
    out = subprocess.run(
        [
            sys.executable, "-m", "pytest",
            os.path.join(TESTS_DIR, "test_oracle_parity.py"),
            os.path.join(TESTS_DIR, "test_curation_stream.py"),
            "--collect-only", "-q", "-p", "no:cacheprovider",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(TESTS_DIR),
    )
    lines = [l for l in out.stdout.splitlines() if "::" in l]
    assert lines, "default collection is empty — gating over-rotated"
    assert not any("test_curation_stream.py" in l for l in lines), (
        "slow-marked file leaked into the default collection"
    )
    # the smoke sample stays, the full parity sweep does not
    parity_cases = [l for l in lines if "test_query_matches_oracle[" in l]
    from tests.test_oracle_parity import NAMES, SMOKE_NAMES

    assert len(parity_cases) == len(SMOKE_NAMES)
    assert 10 <= len(SMOKE_NAMES) < len(NAMES) // 2
