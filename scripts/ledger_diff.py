"""Compare two check_oracle timing ledgers round-over-round.

Automates the BASELINE.md methodology for reading TIMINGS_r{N}.json
artifacts: totals over the comparable query set, biggest movers both
directions, and a regression list filtered to moves that are worth a
solo warm re-time (>threshold AND >min-delta — single-cold-run
ledgers carry ±2-5 s of JIT-ordering noise on xxhash-heavy queries,
so a ratio alone over-flags).

Refuses to compare ledgers recorded with different --threads settings:
an 8-way-concurrent sweep inflates per-query walls 2-20x relative to
a sequential one (measured round 7), so cross-methodology ratios are
meaningless.

Usage: python scripts/ledger_diff.py OLD.json NEW.json
           [--threshold=1.5] [--min-delta=0.5] [--top=12]
Exit code 1 if any regression survives both filters (CI-friendly).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a.lstrip("-").split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    if len(args) != 2:
        print(__doc__)
        return 2
    threshold = float(opts.get("threshold", "1.5"))
    min_delta = float(opts.get("min-delta", "0.5"))
    top = int(opts.get("top", "12"))

    old_doc = json.load(open(args[0]))
    new_doc = json.load(open(args[1]))
    t_old = old_doc.get("threads", 1)
    t_new = new_doc.get("threads", 1)
    if t_old != t_new:
        print(
            f"REFUSING: ledgers were recorded with different concurrency "
            f"(threads={t_old} vs {t_new}); per-query walls are not "
            f"comparable across methodologies (see BASELINE.md)."
        )
        return 2
    for name, doc in (("old", old_doc), ("new", new_doc)):
        load = doc.get("load_1m")
        if load is not None and load > 4:
            print(f"note: {name} ledger recorded at load_1m={load} — noisy box")

    old = old_doc["queries"]
    new = new_doc["queries"]
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    # r07 ADVICE: a null/absent spark_s means the query ERRORED in
    # that ledger — coercing it to 0.0 would read as a large
    # improvement and let the regression gate exit 0 on breakage.
    # Hard-flag instead: print loudly, drop from the comparable set,
    # and force exit 1.
    broken = sorted(
        k
        for k in common
        if not isinstance(old[k].get("spark_s"), (int, float))
        or not isinstance(new[k].get("spark_s"), (int, float))
    )
    if broken:
        print(
            f"BROKEN ({len(broken)} queries with null/absent spark_s — "
            f"errored in one ledger; excluded from totals, exit 1):"
        )
        for k in broken:
            print(
                f"  {k:42s} old={old[k].get('spark_s')!r} "
                f"new={new[k].get('spark_s')!r}"
            )
        common = [k for k in common if k not in set(broken)]

    def spark(d, k):
        return d[k]["spark_s"]

    to = sum(spark(old, k) for k in common)
    tn = sum(spark(new, k) for k in common)
    print(
        f"comparable ({len(common)} queries) spark_s: "
        f"{to:.1f} -> {tn:.1f}  ({tn / to:.2f}x)" if to else "old total is 0"
    )
    if only_old:
        print(f"dropped from new: {', '.join(only_old)}")
    if only_new:
        print(f"new in new: {', '.join(only_new)}")

    moves = sorted(common, key=lambda k: spark(new, k) - spark(old, k))
    print("\n== biggest improvements ==")
    for k in moves[:top]:
        o, n = spark(old, k), spark(new, k)
        if o - n < min_delta:
            break
        print(f"  {k:42s} {o:7.2f} -> {n:7.2f}")

    print(
        f"\n== regressions (> {threshold}x AND > {min_delta}s — "
        f"solo warm re-time before chasing) =="
    )
    flagged = []
    for k in reversed(moves):
        o, n = spark(old, k), spark(new, k)
        if o > 0.05 and n > threshold * o and n - o > min_delta:
            flagged.append(k)
            print(f"  {k:42s} {o:7.2f} -> {n:7.2f}  ({n / o:.2f}x)")
    if not flagged:
        print("  none")
    return 1 if (flagged or broken) else 0


if __name__ == "__main__":
    raise SystemExit(main())
