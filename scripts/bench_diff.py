#!/usr/bin/env python3
"""Per-query bench deltas between two rounds.

Usage: python3 scripts/bench_diff.py <prev.json> <cur.json>

Accepts either a full Bench line ({"metric":"total",...,"queries":
{...}} — as committed in bench_full_r*.json) or a driver BENCH_r*.json
whose "tail" field holds a truncated suffix of that line (partial
queries recovered by regex). Prints every query present in either
file, sorted by delta descending, plus common-subset summary stats.
"""
import json, re, sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return dict(doc["queries"])
    if "tail" in doc:
        pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', doc["tail"])
        # the first pair may be cut mid-name; drop it if the tail
        # doesn't start at a quote boundary
        out = {k: float(v) for k, v in pairs}
        out.pop("value", None)
        return out
    raise SystemExit(f"{path}: neither 'queries' nor 'tail' present")


def main():
    prev_path, cur_path = sys.argv[1], sys.argv[2]
    prev, cur = load(prev_path), load(cur_path)
    names = sorted(set(prev) | set(cur))
    common = [n for n in names if n in prev and n in cur]
    rows = []
    for n in names:
        p, c = prev.get(n), cur.get(n)
        delta = (c - p) if (p is not None and c is not None) else None
        ratio = (c / p) if (p not in (None, 0) and c is not None) else None
        rows.append((n, p, c, delta, ratio))
    rows.sort(key=lambda r: (r[3] is None, -(r[3] or 0)))
    print(f"{'query':28s} {'prev':>8s} {'cur':>8s} {'delta':>8s} {'ratio':>6s}")
    for n, p, c, d, r in rows:
        ps = f"{p:8.3f}" if p is not None else "       -"
        cs = f"{c:8.3f}" if c is not None else "       -"
        ds = f"{d:+8.3f}" if d is not None else "       -"
        rs = f"{r:6.2f}" if r is not None else "     -"
        print(f"{n:28s} {ps} {cs} {ds} {rs}")
    if common:
        ratios = sorted(cur[n] / prev[n] for n in common if prev[n] > 0)
        med = ratios[len(ratios) // 2]
        print(f"\ncommon subset: {len(common)} queries, "
              f"sum {sum(prev[n] for n in common):.1f}s -> "
              f"{sum(cur[n] for n in common):.1f}s, "
              f"median ratio {med:.2f}")
    print(f"only-prev: {sorted(set(prev) - set(cur))}")
    print(f"only-cur:  {sorted(set(cur) - set(prev))}")


if __name__ == "__main__":
    main()
