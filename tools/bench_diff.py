#!/usr/bin/env python3
"""Diff two graft bench.json artifacts (written by graft.Bench).

Usage: tools/bench_diff.py OLD.json NEW.json [threshold]

Prints total movement and every query whose min-of-passes timing moved
more than `threshold` (default 1.3x) in either direction, worst
regressions first — the round-over-round forensics that used to be
manual. Queries only present on one side are listed separately.
"""
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # behave under `| head`


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] / old['value']:.2f}x), "
          f"queries: {len(oq)} -> {len(nq)}")
    both = sorted(set(oq) & set(nq), key=lambda k: -(nq[k] / max(oq[k], 1e-9)))
    moved = [k for k in both
             if nq[k] > thr * oq[k] or oq[k] > thr * nq[k]]
    if moved:
        print(f"\nmoved >{thr}x (worst regressions first):")
        for k in moved:
            print(f"  {k:28s} {oq[k]:7.3f}s -> {nq[k]:7.3f}s "
                  f"({nq[k] / max(oq[k], 1e-9):5.2f}x)")
    else:
        print(f"\nno query moved more than {thr}x")
    for label, only in (("only in OLD", set(oq) - set(nq)),
                        ("only in NEW", set(nq) - set(oq))):
        if only:
            print(f"\n{label}: {', '.join(sorted(only))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
