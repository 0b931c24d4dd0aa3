"""Round-over-round regression read over two BENCH_DETAIL.json files,
applying the r13 metrics protocol (BASELINE.md, calibrated by the
five-run CPU soak):

- shuffle_bytes is the ZERO-noise signal: any per-key change is plan
  drift and is reported unconditionally (new/removed keys are listed,
  not flagged).
- per-key task-CPU flags need BOTH ratio > 1.5x AND absolute delta
  > 0.5 CPU s (the soak measured median per-key max/min of 1.40 across
  quiet same-tree runs — ratio alone is noise), and each flag is
  annotated with whether shuffle corroborates (plan drift) or not
  (needs a second quiet run to count as real).
- board totals (wall, CPU) are printed for the gate read; total CPU
  gets the soak's one-key-outlier check (top mover named).

Usage: python scripts/bench_regress.py BASELINE_DETAIL.json NEW_DETAIL.json
Exit 0 always — this is a report, the gate decision stays human.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[dict, dict]:
    with open(path) as fh:
        d = json.load(fh)
    m = d.get("metrics", {})
    if not m:
        sys.exit(f"{path} has no per-key metrics block")
    return m, d


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    (base, bd), (new, nd) = load(sys.argv[1]), load(sys.argv[2])
    # a regression read is only meaningful between SAME-PROTOCOL
    # recordings: an sf0.001 dev board diffed against the sf0.1
    # baseline reads as a catastrophic plan drift (r14: a small-SF
    # run silently clobbered the committed baseline and the first
    # regress read of the round compared across SFs), and best-of-N
    # identity matters because the 2-rep window sits inside the
    # cold-codegen phase (SCALE.md §24e) — refuse, don't warn
    for field in ("sf", "reps"):
        a, b = bd.get(field), nd.get(field)
        if a is not None and b is not None and a != b:
            sys.exit(f"refusing cross-{field} compare: base {field}={a} "
                     f"vs new {field}={b} — same-protocol boards only")
    common = sorted(set(base) & set(new))
    added = sorted(set(new) - set(base))
    removed = sorted(set(base) - set(new))
    if added:
        print(f"new keys (not compared): {added}")
    if removed:
        print(f"removed keys: {removed}")

    drift = [(k, base[k]["shuffle_bytes"], new[k]["shuffle_bytes"])
             for k in common
             if base[k]["shuffle_bytes"] != new[k]["shuffle_bytes"]]
    print(f"\nshuffle: {len(common) - len(drift)}/{len(common)} keys "
          f"byte-identical")
    for k, b, n in drift:
        print(f"  PLAN DRIFT {k}: shuffle {b} -> {n} "
              f"({(n - b) / max(1, b):+.1%})")

    flags = []
    for k in common:
        b, n = base[k]["task_cpu_s"], new[k]["task_cpu_s"]
        # a 0-CPU baseline (pre-r13 attribution gap, or a genuinely
        # JVM-free key) regressing to real CPU is an infinite ratio —
        # flag it on the absolute-delta bar alone, don't skip it
        if (n / b > 1.5 if b > 0 else True) and n - b > 0.5:
            corro = any(k == d[0] for d in drift)
            flags.append((k, b, n, corro))
    print(f"\nper-key CPU flags (ratio>1.5x AND delta>0.5s): {len(flags)}")
    for k, b, n, corro in sorted(flags, key=lambda t: t[1] - t[2]):
        print(f"  {k}: {b:.2f} -> {n:.2f} CPU s "
              + ("[corroborated by shuffle drift: REAL]" if corro else
                 "[no shuffle change: needs a second quiet run]"))

    bw = sum(v["wall_s"] for v in base.values())
    nw = sum(v["wall_s"] for v in new.values())
    bc = sum(v["task_cpu_s"] for v in base.values())
    nc = sum(v["task_cpu_s"] for v in new.values())
    print(f"\nboard wall  {bw:.1f} -> {nw:.1f} s   "
          f"(gate read only — wall is machine-banded)")
    print(f"board CPU   {bc:.1f} -> {nc:.1f} s  "
          f"({(nc - bc) / bc:+.1%} vs base)" if bc else "")
    movers = sorted(common,
                    key=lambda k: new[k]["task_cpu_s"] - base[k]["task_cpu_s"],
                    reverse=True)
    if movers:
        k = movers[0]
        d = new[k]["task_cpu_s"] - base[k]["task_cpu_s"]
        print(f"top CPU mover: {k} ({d:+.2f} s) — the soak's "
              f"one-key-outlier check: subtract and re-read the total "
              f"before calling the board moved")


if __name__ == "__main__":
    main()
