"""Bench regression diff (r7 verdict #8): compare two bench-detail JSON
files query-by-query and print the movers that exceed their own recorded
warm spread — replacing the ad-hoc verdict arithmetic over
BENCH_BASELINE.md's prose ledger.

Usage::

    python tools/bench_diff.py                 # prior committed BENCH_DETAIL.json vs working copy
    python tools/bench_diff.py OLD.json NEW.json
    python tools/bench_diff.py git:HEAD~3      # that ref's BENCH_DETAIL.json vs working copy

Accepted shapes: bench.py's detail record ({queries, iterative,
spread_pct, ...}) and the driver's BENCH_rN.json wrapper ({parsed:
{queries: top-40, ...}} — no spread there, so the 10% floor applies).

A query is flagged when BOTH hold:

* its relative move exceeds the larger of the two runs' recorded warm
  ``spread_pct`` for that query (floor 10% — tiny spreads on tiny
  queries flag noise otherwise), and
* the absolute move exceeds 0.05 s (sub-tick moves are timer noise).

Exit status is 0 either way — the tool reports, the reader judges (a
flagged mover whose code changed this round is a cost, not a bug).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REL_FLOOR_PCT = 10.0
ABS_FLOOR_SEC = 0.05


def _load(path: str) -> dict:
    if path.startswith("git:"):
        import subprocess

        ref = path[4:]
        raw = subprocess.check_output(
            ["git", "-C", REPO, "show", f"{ref}:BENCH_DETAIL.json"]
        )
        d = json.loads(raw)
    else:
        with open(path) as f:
            d = json.load(f)
    if "parsed" in d and "queries" not in d:  # driver BENCH_rN.json wrapper
        d = d["parsed"]
    qs = dict(d.get("queries", {}))
    qs.update(d.get("iterative", {}))
    if not qs:
        raise SystemExit(f"{path}: no per-query timings found")
    return {"queries": qs, "spread": d.get("spread_pct", {}), "path": path}


def _default_old() -> str:
    """The PRIOR committed BENCH_DETAIL.json: the newest commit whose
    blob differs from the working copy. Taking simply the last commit
    that touched the file would, in a clean tree, diff the file against
    itself and always report 'no movers' — a silent false negative for
    exactly the regression check this tool exists for (review r8)."""
    import subprocess

    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "rb") as f:
        current = f.read()
    commits = subprocess.check_output(
        ["git", "-C", REPO, "log", "--format=%H", "--", "BENCH_DETAIL.json"],
        text=True,
    ).split()
    for c in commits:
        blob = subprocess.check_output(
            ["git", "-C", REPO, "show", f"{c}:BENCH_DETAIL.json"]
        )
        if blob != current:
            return f"git:{c}"
    raise SystemExit(
        "every committed BENCH_DETAIL.json equals the working copy — "
        "nothing to diff against (pass an explicit OLD)"
    )


def main() -> None:
    old_path = sys.argv[1] if len(sys.argv) > 1 else _default_old()
    new_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "BENCH_DETAIL.json")
    )
    old, new = _load(old_path), _load(new_path)
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))

    total_old = sum(old["queries"][q] for q in shared)
    total_new = sum(new["queries"][q] for q in shared)
    print(f"old: {old['path']}")
    print(f"new: {new['path']}")
    if not shared:
        raise SystemExit("no shared queries between the two records")
    print(
        f"shared {len(shared)} queries: {total_old:.2f}s -> {total_new:.2f}s "
        f"({(total_new - total_old) / total_old * 100:+.1f}%)"
    )
    if added:
        t = sum(new["queries"][q] for q in added)
        print(f"added ({len(added)}, {t:.2f}s): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    rows = []
    for q in shared:
        a, b = old["queries"][q], new["queries"][q]
        delta = b - a
        rel = delta / a * 100 if a else 0.0
        tol = max(
            float(old["spread"].get(q, 0.0)),
            float(new["spread"].get(q, 0.0)),
            REL_FLOOR_PCT,
        )
        if abs(rel) > tol and abs(delta) > ABS_FLOOR_SEC:
            rows.append((rel, q, a, b, delta, tol))
    if not rows:
        print("\nno movers past their recorded warm spread.")
        return
    rows.sort(key=lambda r: -abs(r[0]))
    print("\n| query | old s | new s | delta | move | spread tol |")
    print("|---|---|---|---|---|---|")
    for rel, q, a, b, delta, tol in rows:
        print(
            f"| {q} | {a:.2f} | {b:.2f} | {delta:+.2f} | {rel:+.1f}% "
            f"| {tol:.0f}% |"
        )


if __name__ == "__main__":
    main()
