#!/usr/bin/env python3
"""Position-effect analysis for the in-suite bench drift (r15 ask #2).

Usage: python3 tools/position_effect.py <fwd.json> <rev.json>

Both inputs are Bench payloads (target/bench_queries.json) from one forward
and one SPARK_GRAFT_BENCH_ORDER=reverse run of the SAME build. If per-query
time is a property of the QUERY, t_fwd ~= t_rev. If it is a property of the
POSITION (session-state accumulation), a query late in one order is early in
the other, so log(t_rev/t_fwd) grows with how much earlier it runs reversed:
regress log(t_rev/t_fwd) on (pos_fwd - pos_rev)/N in [-1, 1]. A negative
slope means later-run = slower (accumulation); ~0 means noise, not position.
Also prints per-position-quartile mean times for each run and the total gap.
"""
import json
import math
import sys


def load(path):
    d = json.load(open(path))
    return d["queries"], d.get("value")


def main(fwd_path, rev_path):
    fwd, tot_f = load(fwd_path)
    rev, tot_r = load(rev_path)
    names = sorted(set(fwd) & set(rev))
    n = len(names)
    usable = [q for q in names if fwd[q] > 0 and rev[q] > 0]
    if n < 4 or len(usable) < 4:
        print(f"not enough shared positive-time queries to analyze "
              f"(shared={n}, usable={len(usable)}; need >= 4)")
        return
    pos_f = {q: i for i, q in enumerate(sorted(fwd))}
    pos_r = {q: i for i, q in enumerate(sorted(rev, reverse=True))}
    xs, ys = [], []
    for q in names:
        tf, tr = fwd[q], rev[q]
        if tf <= 0 or tr <= 0:
            continue
        # x in [-1, 1]: +1 = runs much earlier reversed than forward
        xs.append((pos_f[q] - pos_r[q]) / n)
        ys.append(math.log(tr / tf))
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    slope = sxy / sxx if sxx else float("nan")
    syy = sum((y - my) ** 2 for y in ys)
    r2 = (sxy * sxy) / (sxx * syy) if sxx and syy else float("nan")
    print(f"n={n} total_fwd={tot_f:.1f}s total_rev={tot_r:.1f}s")
    print(f"slope of log(t_rev/t_fwd) vs earlier-when-reversed: {slope:+.4f} "
          f"(r^2={r2:.3f})")
    print("  interpretation: slope ~ -ln(t_late/t_early); "
          f"implied late-vs-early factor = {math.exp(-slope):.3f}x")
    for label, data, pos in (("fwd", fwd, pos_f), ("rev", rev, pos_r)):
        qs = sorted(data, key=lambda q: pos[q])
        quarts = [qs[i * len(qs) // 4:(i + 1) * len(qs) // 4] for i in range(4)]
        means = [sum(data[q] for q in qq) / len(qq) for qq in quarts]
        print(f"{label} mean s/q by position quartile: " +
              " ".join(f"Q{i+1}={m:.3f}" for i, m in enumerate(means)))
    # biggest individual position-sensitive queries. A query that failed in
    # one run carries Bench's -1 s sentinel (and 0 is conceivable), which
    # would crash math.log exactly on the runs most worth analyzing — require
    # both sides positive and report the skipped names separately.
    per = sorted(((math.log(rev[q] / fwd[q]), q) for q in names
                  if fwd[q] > 0 and rev[q] > 0
                  and (fwd[q] > 0.5 or rev[q] > 0.5)), key=lambda t: abs(t[0]),
                 reverse=True)[:12]
    print("largest |log ratio| among queries >0.5s:")
    for lr, q in per:
        print(f"  {q}: fwd={fwd[q]:.2f}s rev={rev[q]:.2f}s "
              f"(pos_fwd={pos_f[q]}, pos_rev={pos_r[q]})")
    skipped = [q for q in names if fwd[q] <= 0 or rev[q] <= 0]
    if skipped:
        print(f"skipped (failed in at least one run, time <= 0): {skipped}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
