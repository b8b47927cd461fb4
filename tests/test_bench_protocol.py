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
    lucky values."""
    timings = {name: per_query_sec for name in bench.HEADLINE}
    iterative = {name: per_query_sec for name in bench.ITERATIVE}
    summary = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "iterative_total": round(sum(iterative.values()), 3),
        "sf": 0.1,
    }
    line = json.dumps(summary)
    if len(line) > 1800:
        summary.pop("queries")
        summary["detail"] = "BENCH_DETAIL.json"
        line = json.dumps(summary)
    return line


def test_final_summary_line_fits_driver_tail():
    """With the CURRENT query count, the final line (worst-case value
    widths) must stay under 1800 bytes — margin inside the driver's
    ~2000-byte stdout tail. If this fails after adding headline queries,
    bench.py's guard will drop the per-query map at runtime; that is the
    moment to trim HEADLINE instead of losing per-query visibility."""
    line = _summary_line()
    assert len(line) <= 1800, (
        f"final bench line {len(line)}B > 1800B with "
        f"{len(bench.HEADLINE)} headline queries"
    )
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert "queries" in parsed, "size guard tripped: per-query map dropped"


def test_size_guard_drops_map_not_totals():
    """If the line EVER outgrows the cap, the guard must drop the
    per-query map and keep every total — the driver always gets a
    parseable metric line."""
    import bench as b

    timings = {f"q{i:03d}_{'x' * 30}": 999.99 for i in range(200)}
    summary = {
        "metric": "headline_queries_total",
        "value": 1.0,
        "unit": "sec",
        "queries": timings,
        "iterative_total": 2.0,
        "sf": 0.1,
    }
    line = json.dumps(summary)
    assert len(line) > 1800  # the scenario the guard exists for
    summary.pop("queries")
    summary["detail"] = "BENCH_DETAIL.json"
    line = json.dumps(summary)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["value"] == 1.0 and parsed["iterative_total"] == 2.0
    assert parsed["detail"] == "BENCH_DETAIL.json"
    assert b.RUNS >= 3  # min-of-N protocol stays


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
