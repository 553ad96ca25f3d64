#!/usr/bin/env python3
"""Per-query bench regression differ.

Usage: tools/bench_diff.py OLD.json NEW.json [N]

Reads two bench timing artifacts (the full BENCH_TIMINGS*.json line
the bench writes — round-stamped copies via SPARK_GRAFT_BENCH_TAG —
or a driver BENCH_r*.json whose "parsed" field holds the same shape)
and prints the N (default 10) worst per-query deltas in each
direction plus totals. This is the check that would have caught and
attributed the round-10 q127/q131 harness artifacts automatically:
run it r(N-1) -> rN every round and read the regressions first.

A query only in NEW is shown as "new"; only in OLD as "gone"; a -1
timing (bench-failed query) is flagged rather than treated as fast.
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]  # driver BENCH_r*.json wrapper
    qs = doc.get("queries", {})
    gc = doc.get("gc_ms", {})
    return doc, qs, gc


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old_doc, old_q, _ = load(sys.argv[1])
    new_doc, new_q, new_gc = load(sys.argv[2])

    print(f"total: {old_doc.get('value', 0):.1f}s ({len(old_q)} queries) -> "
          f"{new_doc.get('value', 0):.1f}s ({len(new_q)} queries)")
    for name, t in sorted(new_q.items()):
        if t == -1:
            print(f"  FAILED in new: {name}")
    for name in sorted(set(old_q) - set(new_q)):
        print(f"  gone: {name} (was {old_q[name]:.2f}s)")

    common = [(new_q[k] - old_q[k], k) for k in new_q
              if k in old_q and old_q[k] != -1 and new_q[k] != -1]
    fresh = [(new_q[k], k) for k in new_q if k not in old_q and new_q[k] != -1]
    # failed-in-old but ok-in-new: not in `common` (old is -1) and not
    # in `fresh` (the key exists in old) — without this section a
    # recovered query would be invisible in the report
    recovered = [(new_q[k], k) for k in new_q
                 if k in old_q and old_q[k] == -1 and new_q[k] != -1]
    for t, k in sorted(recovered, reverse=True):
        print(f"  recovered: {k} (failed in old, now {t:.2f}s)")

    print(f"\nworst {n} regressions (new - old):")
    for d, k in sorted(common, reverse=True)[:n]:
        gc = f"  gc={new_gc[k]}ms" if k in new_gc else ""
        print(f"  {k:<30} {old_q[k]:7.2f}s -> {new_q[k]:7.2f}s  ({d:+.2f}s){gc}")
    print(f"\nbest {n} improvements:")
    for d, k in sorted(common)[:n]:
        if d >= 0:
            break
        print(f"  {k:<30} {old_q[k]:7.2f}s -> {new_q[k]:7.2f}s  ({d:+.2f}s)")
    if fresh:
        print(f"\nnew queries (top {n} by cost):")
        for t, k in sorted(fresh, reverse=True)[:n]:
            print(f"  {k:<30} {t:7.2f}s  (new)")


if __name__ == "__main__":
    main()
