#!/usr/bin/env python3
"""Merge N bench-run JSON lines into one BENCH_LOCAL snapshot.

Usage: merge_bench.py OUT.json [--canary CANARY.json] RUN1.json [RUN2.json ...]

--canary embeds the quiet-window `Probe hostcanary` line (required in
every committed merge from round 14: BASELINE.md's cold contract is
canary-normalized, so a merge without its host_canary cannot be
evaluated).

Per-query steady value = min across runs (each run is itself a
min-of-2 within one JVM, so this is the documented min-of-N protocol:
between-JVM noise — JIT, GC heap layout, co-tenant stalls — lands on
different queries per run and the min recovers the plan cost).
Plan-node counts must agree across runs for a timing to count: AQE
re-plans at runtime, so a borderline broadcast/coalesce can shift a
query's final plan in one run — such a run's timing for THAT query is
excluded from the min (with a warning), because it timed a different
plan. The recorded plan is the across-runs majority plan. cold_total
is taken from the first run (the headline cold number keeps one run's
real end-to-end composition). cold_queries — each run's per-query
FIRST-execution time, a legitimate cold sample per fresh JVM — are
merged per-query as min across the runs that recorded them (same
min-of-N rationale as steady: between-JVM noise lands on different
queries per run), so cold regressions stay attributable per query;
their sum is recorded as cold_total_minmerged next to the
single-run cold_total.
"""
import json
import sys
from collections import Counter


def main() -> None:
    args = sys.argv[1:]
    canary = None
    if "--canary" in args:
        i = args.index("--canary")
        with open(args[i + 1]) as f:
            canary = json.load(f)
        args = args[:i] + args[i + 2:]
    out, first, *rest = args
    runs = []
    for p in [first] + rest:
        with open(p) as f:
            runs.append(json.load(f))
    base = runs[0]
    # a query is merged over the runs that MEASURED it: runs from
    # before a query was registered simply don't vote for it (the
    # registry grows mid-round; a union merge applies the same
    # min-of-N protocol per query with N = runs covering it)
    names = set().union(*(set(r["queries"]) for r in runs))
    # recorded in the snapshot (not just printed): a late-registered
    # query merged from fewer runs is min-of-N with a smaller N, and
    # the merged JSON must be self-describing about that
    runs_covering = {q: sum(1 for r in runs if q in r["queries"])
                     for q in names}
    for q in sorted(names):
        if runs_covering[q] < len(runs):
            print(f"note: {q} measured in {runs_covering[q]}/{len(runs)} runs")
    plans, merged = {}, {}
    for q in names:
        qruns = [r for r in runs if q in r["queries"]]
        votes = Counter(json.dumps(r["plans"][q], sort_keys=True) for r in qruns)
        top_plan, top_n = votes.most_common(1)[0]
        if len(votes) > 1 and top_n * 2 <= len(qruns):
            # no strict majority (e.g. a 1-1 AQE split): there is no
            # basis to prefer either plan's timings — min over ALL runs
            # and record the first run's plan, loudly
            print(f"warning: {q} has NO majority plan "
                  f"({dict(votes.most_common())}); min over all runs, "
                  f"first run's plan recorded")
            plans[q] = qruns[0]["plans"][q]
            merged[q] = min(r["queries"][q] for r in qruns)
            continue
        plans[q] = json.loads(top_plan)
        keep = [r["queries"][q] for r in qruns
                if json.dumps(r["plans"][q], sort_keys=True) == top_plan]
        if len(keep) < len(qruns):
            print(f"warning: {q} plan diverged in {len(qruns) - len(keep)} "
                  f"run(s); min over the {len(keep)} majority-plan run(s)")
        merged[q] = min(keep)
    base["plans"] = plans
    # warmed is a per-run measurement protocol (per-query sf0.001
    # warm-up pass vs SPARK_GRAFT_BENCH_NOWARM): merging runs with
    # different flags silently mixes two protocols in the per-query
    # mins, so the snapshot records the per-run list and warns
    warmed_flags = [r.get("warmed") for r in runs]
    if len(set(map(str, warmed_flags))) > 1:
        print(f"warning: runs mix measurement protocols "
              f"(warmed={warmed_flags}); per-query mins span both")
    # per-query cold (first-execution) min across the runs recording it
    # — older run files may predate cold_queries, so they just don't
    # vote; a query cold in zero runs is omitted
    cold_q = {}
    for q in names:
        samples = [r["cold_queries"][q] for r in runs
                   if q in r.get("cold_queries", {})
                   and r["cold_queries"][q] >= 0]
        if samples:
            cold_q[q] = min(samples)
    snap = {
        "metric": "total",
        "value": sum(merged.values()),
        "unit": "sec",
        "cold_total": base["cold_total"],
        "cold_total_minmerged": sum(cold_q.values()),
        "cold_queries": cold_q,
        "n": len(merged),
        "runs_merged": len(runs),
        # only queries present in ALL runs got the full min-of-N;
        # cold_total comes from runs[0] and covers only its queries
        "runs_covering": {q: n for q, n in sorted(runs_covering.items())
                          if n < len(runs)},
        "cold_covers_n": len(runs[0]["queries"]),
        "warmed": (warmed_flags[0] if len(set(map(str, warmed_flags))) == 1
                   else warmed_flags),
        "failed": 0,
        "top5": dict(sorted(merged.items(), key=lambda kv: -kv[1])[:5]),
        "queries": merged,
        "plans": base["plans"],
        "sf": base["sf"],
    }
    if canary is not None:
        snap["host_canary"] = canary
    with open(out, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    print(f"merged {len(runs)} runs -> {out}: steady {snap['value']:.1f}s, "
          f"top5 {list(snap['top5'].items())[:5]}")


if __name__ == "__main__":
    main()
