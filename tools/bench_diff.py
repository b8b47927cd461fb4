"""Bench regression diff (r7 verdict #8): compare two bench-detail JSON
files query-by-query and print the movers that exceed their own recorded
warm spread — replacing the ad-hoc verdict arithmetic over
BENCH_BASELINE.md's prose ledger.

Usage::

    python tools/bench_diff.py                 # prior committed BENCH_DETAIL.json vs working copy
    python tools/bench_diff.py OLD.json NEW.json
    python tools/bench_diff.py git:HEAD~3      # that ref's BENCH_DETAIL.json vs working copy
    python tools/bench_diff.py --json [OLD [NEW]]           # the same record as one JSON object
    python tools/bench_diff.py --ledger N [OLD [NEW]]       # upsert round N's row into BENCH_LEDGER.json

``--ledger N`` is the round-close step (r8 verdict #7): it writes the
machine-readable mover table into ``BENCH_LEDGER.json`` (a JSON array,
one row per round, keyed and replaced by ``round``), retiring the prose
ledger in BENCH_BASELINE.md to narrative-only duty.

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
# sweep rows are SINGLE-run (bench.py's coverage section, r12): no warm
# spread exists and one sample carries the full documented ±30% box
# noise, so the mover floor sits above it — the sweep exists to catch
# order-of-magnitude plan regressions, not 20% drifts
SWEEP_REL_FLOOR_PCT = 50.0
SWEEP_ABS_FLOOR_SEC = 0.15


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
    partial = False
    if "parsed" in d and "queries" not in d:  # driver BENCH_rN.json wrapper
        if d["parsed"] is None:
            # r3/r4-era wrappers: the driver truncated the JSON line and
            # recorded only a front-clipped `tail` string. Salvage the
            # intact "name": seconds pairs it still holds; the first pair
            # after the clip may carry a mangled name, so require a
            # well-formed quoted identifier.
            import re

            def pairs(s: str) -> dict:
                return {
                    m.group(1): float(m.group(2))
                    for m in re.finditer(
                        r'"([a-z][a-z0-9_]*)":\s*([0-9]+\.?[0-9]*)', s
                    )
                }

            # the tail holds the queries/iterative sections (seconds)
            # FOLLOWED by spread_pct (percent): split at the marker or
            # the percent values would overwrite the seconds
            head, _, rest = d.get("tail", "").partition('"spread_pct"')
            qs = pairs(head)
            for k in ("sf", "value", "iterative_total"):
                qs.pop(k, None)
            spread = pairs(rest)
            spread.pop("sf", None)
            if not qs:
                raise SystemExit(f"{path}: no per-query timings found")
            return {"queries": qs, "spread": spread, "path": path,
                    "payload_mb": {}, "sweep": {}, "partial": True}
        d = d["parsed"]
    qs = dict(d.get("queries", {}))
    qs.update(d.get("iterative", {}))
    if not qs:
        raise SystemExit(f"{path}: no per-query timings found")
    return {"queries": qs, "spread": d.get("spread_pct", {}), "path": path,
            "payload_mb": d.get("payload_mb", {}),
            "sweep": d.get("sweep", {}), "partial": partial}


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


def diff_record(old_path: str, new_path: str) -> dict:
    """The full comparison as one JSON-serializable record — the single
    source both renderers (prose table, ledger row) consume."""
    old, new = _load(old_path), _load(new_path)
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    if not shared:
        raise SystemExit("no shared queries between the two records")
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))
    total_old = sum(old["queries"][q] for q in shared)
    total_new = sum(new["queries"][q] for q in shared)

    # bytes-normalized throughput for the multimodal payload parsers
    # (r10 verdict: wall-seconds conflate parser cost with synth corpus
    # byte volume — a mover whose seconds-per-megabyte is flat is corpus
    # growth, not a parser regression). Present only when BOTH records
    # carry bench.py's payload_mb section for the query.
    bytes_norm = {}
    for q in shared:
        mb_a = float(old["payload_mb"].get(q, 0.0))
        mb_b = float(new["payload_mb"].get(q, 0.0))
        if mb_a > 0 and mb_b > 0:
            spgb_a = old["queries"][q] / mb_a * 1000  # sec per GB
            spgb_b = new["queries"][q] / mb_b * 1000
            bytes_norm[q] = {
                "mb_old": round(mb_a, 2),
                "mb_new": round(mb_b, 2),
                "s_per_gb_old": round(spgb_a, 2),
                "s_per_gb_new": round(spgb_b, 2),
                "norm_move_pct": round((spgb_b - spgb_a) / spgb_a * 100, 1),
            }

    movers = []
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
            m = {
                "query": q,
                "old_s": round(a, 3),
                "new_s": round(b, 3),
                "delta_s": round(delta, 3),
                "move_pct": round(rel, 1),
                "tol_pct": round(tol, 1),
            }
            bn = bytes_norm.get(q)
            if bn:
                m["norm_move_pct"] = bn["norm_move_pct"]
                # seconds moved past tolerance but seconds-per-byte did
                # not: the payload corpus grew, the parser did not slow
                m["corpus_growth"] = abs(bn["norm_move_pct"]) <= tol
            movers.append(m)
    movers.sort(key=lambda m: -abs(m["move_pct"]))

    # sweep section (single-run coverage rows): separate comparison with
    # the wider single-sample floor; never folded into the shared-set
    # totals so ledger rows stay comparable across rounds
    sweep_shared = sorted(set(old["sweep"]) & set(new["sweep"]))
    sweep_movers = []
    for q in sweep_shared:
        a, b = old["sweep"][q], new["sweep"][q]
        delta = b - a
        rel = delta / a * 100 if a else 0.0
        if abs(rel) > SWEEP_REL_FLOOR_PCT and abs(delta) > SWEEP_ABS_FLOOR_SEC:
            sweep_movers.append({
                "query": q,
                "old_s": round(a, 3),
                "new_s": round(b, 3),
                "delta_s": round(delta, 3),
                "move_pct": round(rel, 1),
            })
    sweep_movers.sort(key=lambda m: -abs(m["move_pct"]))
    return {
        "old": old["path"],
        "new": new["path"],
        "n_shared": len(shared),
        "shared_total_old_s": round(total_old, 3),
        "shared_total_new_s": round(total_new, 3),
        "shared_move_pct": round(
            (total_new - total_old) / total_old * 100, 1
        ),
        "added": added,
        "added_total_s": round(
            sum(new["queries"][q] for q in added), 3
        ),
        "removed": removed,
        "movers": movers,
        **(
            {"n_sweep_shared": len(sweep_shared), "sweep_movers": sweep_movers}
            if sweep_shared
            else {}
        ),
        **({"bytes_norm": bytes_norm} if bytes_norm else {}),
        **(
            {"partial": True}
            if old.get("partial") or new.get("partial")
            else {}
        ),
    }


def _print_prose(rec: dict) -> None:
    print(f"old: {rec['old']}")
    print(f"new: {rec['new']}")
    print(
        f"shared {rec['n_shared']} queries: {rec['shared_total_old_s']:.2f}s"
        f" -> {rec['shared_total_new_s']:.2f}s ({rec['shared_move_pct']:+.1f}%)"
    )
    if rec["added"]:
        print(
            f"added ({len(rec['added'])}, {rec['added_total_s']:.2f}s): "
            + ", ".join(rec["added"])
        )
    if rec["removed"]:
        print(f"removed ({len(rec['removed'])}): {', '.join(rec['removed'])}")
    if not rec["movers"]:
        print("\nno movers past their recorded warm spread.")
        return
    print("\n| query | old s | new s | delta | move | spread tol | note |")
    print("|---|---|---|---|---|---|---|")
    for m in rec["movers"]:
        note = ""
        if "norm_move_pct" in m:
            note = f"bytes-norm {m['norm_move_pct']:+.1f}%"
            if m.get("corpus_growth"):
                note += " (corpus growth)"
        print(
            f"| {m['query']} | {m['old_s']:.2f} | {m['new_s']:.2f} "
            f"| {m['delta_s']:+.2f} | {m['move_pct']:+.1f}% "
            f"| {m['tol_pct']:.0f}% | {note} |"
        )
    if rec.get("sweep_movers"):
        print(
            f"\nsweep movers (single-run rows, {SWEEP_REL_FLOOR_PCT:.0f}% "
            "floor — re-run isolated before believing one):"
        )
        for m in rec["sweep_movers"]:
            print(
                f"  {m['query']}: {m['old_s']:.2f} -> {m['new_s']:.2f}s "
                f"({m['move_pct']:+.1f}%)"
            )
    bn = rec.get("bytes_norm")
    if bn:
        print("\npayload throughput (s/GB, bytes-normalized):")
        for q, v in sorted(bn.items()):
            print(
                f"  {q}: {v['s_per_gb_old']:.2f} -> {v['s_per_gb_new']:.2f}"
                f" s/GB ({v['norm_move_pct']:+.1f}%) over"
                f" {v['mb_old']:.1f} -> {v['mb_new']:.1f} MB"
            )


def main() -> None:
    argv = sys.argv[1:]
    mode, round_no = "prose", None
    if argv and argv[0] == "--json":
        mode, argv = "json", argv[1:]
    elif argv and argv[0] == "--ledger":
        if len(argv) < 2 or not argv[1].isdigit():
            raise SystemExit("--ledger needs a round number")
        mode, round_no, argv = "ledger", int(argv[1]), argv[2:]

    old_path = argv[0] if argv else _default_old()
    new_path = (
        argv[1] if len(argv) > 1 else os.path.join(REPO, "BENCH_DETAIL.json")
    )
    rec = diff_record(old_path, new_path)

    if mode == "prose":
        _print_prose(rec)
    elif mode == "json":
        print(json.dumps(rec, indent=1))
    else:
        rec = {"round": round_no, **rec}
        ledger_path = os.path.join(
            os.environ.get("BENCH_LEDGER_DIR", REPO), "BENCH_LEDGER.json"
        )
        ledger = []
        if os.path.exists(ledger_path):
            with open(ledger_path) as f:
                ledger = json.load(f)
        ledger = [r for r in ledger if r.get("round") != round_no]
        ledger.append(rec)
        ledger.sort(key=lambda r: r["round"])
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=1)
            f.write("\n")
        print(
            f"BENCH_LEDGER.json: round {round_no} row written "
            f"({len(rec['movers'])} movers, shared move "
            f"{rec['shared_move_pct']:+.1f}%)"
        )


if __name__ == "__main__":
    main()
