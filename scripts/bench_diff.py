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
    """Returns (wall_by_query, cpu_by_query, io_by_query); cpu/io may be
    empty (pre-r8 artifacts and truncated driver tails carry neither)."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        cpu = {k: min(v) for k, v in doc.get("cpu", {}).items() if v}
        return dict(doc["queries"]), cpu, doc.get("io", {})
    if "tail" in doc:
        pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', doc["tail"])
        # a tail cut mid-pair cannot produce a phantom: the regex
        # requires the OPENING quote, and a cut inside `"name"` leaves
        # `ame":1.2` (no quote before the fragment, no match) while a
        # cut exactly on the quote leaves the pair complete — so the
        # first match is always a genuine (name, wall) pair
        out = {k: float(v) for k, v in pairs}
        out.pop("value", None)
        return out, {}, {}
    raise SystemExit(f"{path}: neither 'queries' nor 'tail' present")


def main():
    if len(sys.argv) < 3:
        raise SystemExit("usage: bench_diff.py <prev.json> <cur.json>")
    prev_path, cur_path = sys.argv[1], sys.argv[2]
    (prev, prev_cpu, _), (cur, cur_cpu, cur_io) = load(prev_path), load(cur_path)
    # isolation header (round-10 verdict #6): a future interference
    # storm must be visible in the diff, not just in the raw io JSON.
    if cur_io:
        resident = sorted(n for n, m in cur_io.items()
                          if m.get("resident_start", 0) > 0)
        spilled = sorted(n for n, m in cur_io.items()
                         if any(m.get("spill", [])))
        print(f"isolation: {len(resident)}/{len(cur_io)} queries nonzero "
              f"resident_start, {len(spilled)} spilled"
              + (f"; resident: {resident}" if resident else "")
              + (f"; spilled: {spilled}" if spilled else ""))
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
    # CPU trend gate: wall time on a shared box is noisy (the round-9
    # diff was unreadable for it), but per-query CPU-seconds are not —
    # a CPU regression is a plan/code regression, not scheduling. Flag
    # >1.5x growth on queries costing >= 0.2 CPU-s (below that, JIT
    # and listener jitter dominate the ratio).
    cpu_common = [n for n in cur_cpu if n in prev_cpu and prev_cpu[n] >= 0.2]
    # noise-window guard (round-12 finding): this shared microVM has
    # host-contention windows where reported executorCpuTime inflates
    # 2-30x while WALL stays near-flat and stack sampling shows idle
    # executors — guest thread-CPU-clock distortion, not work. A row
    # whose cpu/wall DENSITY moved >3x while wall moved <1.3x in
    # either direction cannot be a plan regression (real extra work
    # on a 32-thread box moves wall too); suppress it from the CPU
    # gate and name it, so no future round burns analysis time
    # re-deriving this.
    suspects = []
    for n in list(cpu_common):
        pw, cw = prev.get(n), cur.get(n)
        if not pw or not cw or pw <= 0 or cw <= 0:
            continue
        dens_ratio = (cur_cpu[n] / cw) / (prev_cpu[n] / pw)
        wall_ratio = cw / pw
        if (dens_ratio > 3 or dens_ratio < 1 / 3) and 1 / 1.3 < wall_ratio < 1.3:
            suspects.append((n, dens_ratio, wall_ratio))
            cpu_common.remove(n)
    if suspects:
        suspects.sort(key=lambda r: -max(r[1], 1 / r[1]))
        print("\nCLOCK-DISTORTION SUSPECTS (cpu/wall density moved >3x "
              "with wall flat — guest CPU-clock noise, CPU conclusions "
              "suppressed; trust wall + shuffle bytes):")
        for n, dr, wr in suspects:
            print(f"  {n:28s} density {dr:5.2f}x, wall {wr:5.2f}x")
    if cpu_common:
        flagged = [(n, prev_cpu[n], cur_cpu[n], cur_cpu[n] / prev_cpu[n])
                   for n in cpu_common if cur_cpu[n] / prev_cpu[n] > 1.5]
        flagged.sort(key=lambda r: -r[3])
        cr = sorted(cur_cpu[n] / prev_cpu[n] for n in cpu_common)
        print(f"\ncpu trend ({len(cpu_common)} queries >=0.2 cpu-s): "
              f"sum {sum(prev_cpu[n] for n in cpu_common):.1f} -> "
              f"{sum(cur_cpu[n] for n in cpu_common):.1f} cpu-s, "
              f"median ratio {cr[len(cr) // 2]:.2f}")
        if flagged:
            print("CPU REGRESSIONS (>1.5x, soft gate — explain or fix):")
            for n, p, c, r in flagged:
                print(f"  {n:28s} {p:8.3f} -> {c:8.3f} cpu-s ({r:.2f}x)")
        else:
            print("no cpu regressions >1.5x")


if __name__ == "__main__":
    main()
