#!/usr/bin/env python3
"""Shared-basis comparison of two committed bench merges.

Usage: compare_bench.py OLD.json NEW.json [ratio_flag_threshold]

Prints the numbers every round's contract review re-derives by hand
(SCALING.md "BENCH_LOCAL_rNN" sections): full and shared-basis steady
and cold totals, per-query regressions above the flag threshold
(default 1.3x, minimum 0.3 s absolute on the larger side so noise-floor
sub-tenths don't flag), the new/retired query sets with their own
steady/cold cost, Spearman rank correlation of the shared cold
composition, and the host-canary ratio when both merges carry one.

This is a dev tool only — the shipped engine is the Scala library.
"""
import json
import sys


def spearman(xs, ys):
    def rank(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        for pos, i in enumerate(order):
            r[i] = pos
        return r
    rx, ry = rank(xs), rank(ys)
    n = len(xs)
    if n < 2:
        return float("nan")
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    return num / den if den else float("nan")


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    gone = sorted(set(oq) - set(nq))

    print(f"old: {old_p}  steady {old['value']:.1f}s / {len(oq)} q, "
          f"cold minmerged {old.get('cold_total_minmerged', float('nan')):.1f}s")
    print(f"new: {new_p}  steady {new['value']:.1f}s / {len(nq)} q, "
          f"cold minmerged {new.get('cold_total_minmerged', float('nan')):.1f}s")

    so = sum(oq[q] for q in shared)
    sn = sum(nq[q] for q in shared)
    print(f"\nshared-{len(shared)} steady basis: {sn:.1f} vs {so:.1f} "
          f"= {sn / so:.3f}x")
    oc, nc = old.get("cold_queries", {}), new.get("cold_queries", {})
    cshared = sorted(set(oc) & set(nc))
    if cshared:
        co = sum(oc[q] for q in cshared)
        cn = sum(nc[q] for q in cshared)
        print(f"shared-{len(cshared)} cold basis:   {cn:.1f} vs {co:.1f} "
              f"= {cn / co:.3f}x")
        print(f"cold rank composition (Spearman): "
              f"{spearman([oc[q] for q in cshared], [nc[q] for q in cshared]):.3f}")

    if added:
        print(f"\nnew queries ({len(added)}):")
        for q in added:
            print(f"  {q}: steady {nq[q]:.2f}s"
                  + (f", cold {nc[q]:.2f}s" if q in nc else ""))
    if gone:
        print(f"retired queries ({len(gone)}): {', '.join(gone)}")

    regs = [(nq[q] / oq[q], q) for q in shared
            if oq[q] > 0 and nq[q] / oq[q] > thresh
            and max(nq[q], oq[q]) >= 0.3]
    improv = [(nq[q] / oq[q], q) for q in shared
              if nq[q] > 0 and oq[q] / nq[q] > thresh
              and max(nq[q], oq[q]) >= 0.3]
    print(f"\nsteady regressions > {thresh}x (and >= 0.3 s):")
    for r, q in sorted(regs, reverse=True):
        print(f"  {q}: {oq[q]:.2f} -> {nq[q]:.2f} s ({r:.2f}x)")
    if not regs:
        print("  none")
    print(f"steady improvements > {thresh}x (and >= 0.3 s):")
    for r, q in sorted(improv, reverse=True):
        print(f"  {q}: {oq[q]:.2f} -> {nq[q]:.2f} s ({1 / r:.2f}x)")
    if not improv:
        print("  none")

    def flat_canary(h):
        # r14+ merges may carry {before, after} endpoint canaries for a
        # drifting window; pair comparisons with the 'before' endpoint
        # (the minmerged basis is dominated by the earliest/fastest run)
        if h is None:
            return None
        return h.get("before", h) if "canary_mt" not in h else h

    ho, hn = flat_canary(old.get("host_canary")), flat_canary(new.get("host_canary"))
    if ho and hn:
        print(f"\nhost canary: st {ho['canary_st']:.3f} -> {hn['canary_st']:.3f} "
              f"({hn['canary_st'] / ho['canary_st']:.3f}x), "
              f"mt {ho['canary_mt']:.3f} -> {hn['canary_mt']:.3f} "
              f"({hn['canary_mt'] / ho['canary_mt']:.3f}x)")
    elif hn or ho:
        print("\nhost canary present in only one merge")


if __name__ == "__main__":
    main()
