"""bench.py's stdout contract: the driver reads only the LAST ~2000 bytes
of stdout and parses the LAST line as JSON. Round 3 silently broke this
(one fat line got truncated mid-map → `parsed: null` in BENCH_r03.json);
bench.py now prints a detail line first and a size-guarded FINAL summary
line. These tests freeze that protocol WITHOUT running the bench: they
rebuild the summary line exactly as main() does, from the current
HEADLINE/ITERATIVE sets, so adding queries can never silently push the
final line past the driver's tail again."""

from __future__ import annotations

import json

import bench


def _summary_line(per_query_sec: float = 999.999) -> str:
    """The FINAL stdout line main() would print, worst-case widths: every
    timing at the widest realistic rendering (999.99 after the 2-digit
    round) so the guard is tested against an upper bound, not today's
    lucky values. Uses bench's OWN line builder so the test can't drift
    from main()."""
    timings = {name: per_query_sec for name in bench.HEADLINE}
    iterative = {name: per_query_sec for name in bench.ITERATIVE}
    return bench._build_summary_line(
        round(sum(timings.values()), 3), timings, iterative, 0.1,
        sweep_total=99999.999,  # worst-case width of the r12 sweep total
    )


def test_final_summary_line_fits_driver_tail():
    """With the CURRENT query count, the final line (worst-case value
    widths) must stay under 1800 bytes — margin inside the driver's
    ~2000-byte stdout tail — and must still carry a per-query map: the
    graded guard bounds it to the SUMMARY_TOP heaviest queries (the
    regression-triage set; the full map lives in BENCH_DETAIL.json and
    the detail stdout line) before it would ever drop the map entirely."""
    line = _summary_line()
    assert len(line) <= 1800, (
        f"final bench line {len(line)}B > 1800B with "
        f"{len(bench.HEADLINE)} headline queries"
    )
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert "queries" in parsed, "guard dropped the map entirely"
    assert len(parsed["queries"]) >= min(len(bench.HEADLINE), bench.SUMMARY_TOP)
    if "queries_omitted" in parsed:
        assert parsed["queries_omitted"] == len(bench.HEADLINE) - len(
            parsed["queries"]
        )
        assert parsed["detail"] == "BENCH_DETAIL.json"


def test_size_guard_bounds_map_keeps_totals():
    """If the line EVER outgrows the cap, the graded guard must first
    bound the map to the heaviest SUMMARY_TOP queries (+ omitted count),
    and in the extreme drop it — but ALWAYS keep every total so the
    driver gets a parseable metric line."""
    import bench as b

    timings = {f"q{i:03d}_{'x' * 30}": 999.99 - i for i in range(200)}
    line = b._build_summary_line(1.0, timings, {"pagerank": 2.0}, 0.1)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["value"] == 1.0 and parsed["iterative_total"] == 2.0
    if "queries" in parsed:
        # bounded to the heaviest entries, heaviest-first by construction
        assert len(parsed["queries"]) <= b.SUMMARY_TOP
        assert parsed["queries_omitted"] == 200 - len(parsed["queries"])
        assert "q000_" + "x" * 30 in parsed["queries"]  # heaviest kept
    assert parsed["detail"] == "BENCH_DETAIL.json"
    assert b.RUNS >= 3  # min-of-N protocol stays


def test_summary_guard_pins_prev_round_names():
    """r13 (verdict #8): a noisy newcomer cannot evict previously-reported
    queries from the parsed window — every PREV_SUMMARY name present in
    the timings survives the size guard, so PERF's common set can only
    grow round-over-round."""
    import bench as b

    timings = {name: 0.5 for name in b.PREV_SUMMARY}
    # 60 slow newcomers that would fill a raw top-40 entirely
    timings.update({f"noisy{i:02d}_{'y' * 20}": 500.0 + i for i in range(60)})
    line = b._build_summary_line(1.0, timings, {"pagerank": 2.0}, 0.1)
    assert len(line) <= 1800
    parsed = json.loads(line)
    present = set(parsed["queries"])
    assert set(b.PREV_SUMMARY) <= present, (
        "size guard evicted pinned prev-round names: "
        f"{sorted(set(b.PREV_SUMMARY) - present)}"
    )
    assert parsed["queries_omitted"] == len(timings) - len(present)
    assert parsed["detail"] == "BENCH_DETAIL.json"


def test_summary_prev_names_are_registered():
    """PREV_SUMMARY must stay a subset of the benched sets — a typo'd or
    renamed name would silently stop pinning that query."""
    covered = set(bench.HEADLINE) | set(bench.ITERATIVE)
    assert set(bench.PREV_SUMMARY) <= covered


def test_headline_sets_registered():
    """Every benched name must exist in the query registry — a renamed
    query would otherwise only fail at driver bench time."""
    import __spark_entry__ as entry

    registry = entry.queries()
    missing = [
        n for n in list(bench.HEADLINE) + list(bench.ITERATIVE)
        if n not in registry
    ]
    assert missing == []


def test_sweep_covers_every_registered_query():
    """The r12 coverage sweep: every registered query must be timed by
    SOME bench section — headline (min-of-3), iterative, or the one-run
    sweep. The sweep is 'everything else' by construction in main(), so
    the pin here is that the construction inputs stay consistent: the
    headline/iterative names are registry names (test above) and no
    registry name is silently excluded."""
    import __spark_entry__ as entry

    registry = set(entry.queries())
    covered = set(bench.HEADLINE) | set(bench.ITERATIVE)
    # main() sweeps registry − covered: nothing can be left out
    assert covered <= registry
    assert registry - covered  # the sweep section is non-empty


def test_bench_diff_sweep_movers_separate_floor(tmp_path):
    """Sweep rows (single-run) are compared with the wider 50%/0.15s
    floor and never fold into the shared-set totals."""
    import json as _json
    import subprocess
    import sys

    old = {
        "queries": {"a": 1.00},
        "sweep": {"s_noise": 1.00, "s_regress": 0.50, "s_tiny": 0.05},
    }
    new = {
        "queries": {"a": 1.00},
        "sweep": {"s_noise": 1.40, "s_regress": 5.00, "s_tiny": 0.14},
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(_json.dumps(old))
    pn.write_text(_json.dumps(new))
    out = subprocess.check_output(
        [sys.executable, "tools/bench_diff.py", "--json", str(po), str(pn)],
        text=True,
    )
    rec = _json.loads(out)
    got = {m["query"] for m in rec["sweep_movers"]}
    assert got == {"s_regress"}  # +40% noise and +180%-of-90ms both pass
    assert rec["n_shared"] == 1  # sweep rows not folded into shared set
    assert rec["n_sweep_shared"] == 3


def test_bench_diff_flags_movers_and_unwraps_driver_record(tmp_path):
    """tools/bench_diff.py: movers past max(old spread, new spread, 10%)
    AND past 0.05s absolute are flagged; within-spread moves are not;
    the driver's BENCH_rN.json wrapper ({parsed: ...}) unwraps; added/
    removed sets are reported."""
    import json as _json
    import subprocess
    import sys

    old = {
        "queries": {"a": 1.00, "b": 0.50, "c": 0.10, "gone": 0.2},
        "iterative": {"it": 4.0},
        "spread_pct": {"a": 30.0, "b": 5.0},
    }
    new = {
        "parsed": {  # driver wrapper shape
            "queries": {
                "a": 1.20,   # +20% but spread tol 30% -> NOT flagged
                "b": 0.70,   # +40% past tol -> flagged
                "c": 0.14,   # +40% but |delta| 0.04 < 0.05 -> NOT flagged
                "new_q": 0.3,
                "it": 6.0,   # +50% -> flagged (iterative folds in)
            }
        }
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(_json.dumps(old))
    pn.write_text(_json.dumps(new))
    out = subprocess.check_output(
        [sys.executable, "tools/bench_diff.py", str(po), str(pn)], text=True
    )
    assert "| b |" in out and "| it |" in out
    assert "| a |" not in out and "| c |" not in out
    assert "added (1" in out and "new_q" in out
    assert "removed (1): gone" in out


def test_bench_diff_json_ledger_and_tail_salvage(tmp_path):
    """The r9 ledger modes: --json emits the record as one JSON object;
    --ledger N upserts (keyed by round) into BENCH_LEDGER.json; a
    driver wrapper with parsed=None salvages seconds from the clipped
    `tail` WITHOUT letting the spread_pct percent section overwrite
    them, and marks the record partial."""
    import json as _json
    import subprocess
    import sys

    old = {
        "queries": {"a": 1.00, "b": 0.50},
        "spread_pct": {"a": 30.0},
    }
    # tail: clipped front, queries seconds then spread_pct percents —
    # the percents for a/b must NOT overwrite the seconds
    new = {
        "parsed": None,
        "tail": 'x": 9.9, "a": 1.2, "b": 0.8}, "iterative_total": 9.0, '
        '"spread_pct": {"a": 50.0, "b": 4.0}, "sf": 0.1}',
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(_json.dumps(old))
    pn.write_text(_json.dumps(new))

    out = subprocess.check_output(
        [sys.executable, "tools/bench_diff.py", "--json", str(po), str(pn)],
        text=True,
    )
    rec = _json.loads(out)
    assert rec["partial"] is True
    got = {m["query"]: m for m in rec["movers"]}
    # b: 0.5 -> 0.8 (+60% past max(4%, 10%) tol) flagged with SECONDS
    assert got["b"]["new_s"] == 0.8
    # a: 1.0 -> 1.2 (+20%) inside the salvaged 50% spread -> not flagged
    assert "a" not in got
    assert "iterative_total" not in rec["added"]

    # --ledger upserts keyed by round into BENCH_LEDGER.json
    import os as _os

    env = dict(_os.environ, BENCH_LEDGER_DIR=str(tmp_path))
    for _ in range(2):  # run twice: second run must replace, not append
        subprocess.check_output(
            [
                sys.executable, "tools/bench_diff.py", "--ledger", "7",
                str(po), str(pn),
            ],
            text=True,
            env=env,
        )
    ledger = _json.loads((tmp_path / "BENCH_LEDGER.json").read_text())
    assert len(ledger) == 1 and ledger[0]["round"] == 7
