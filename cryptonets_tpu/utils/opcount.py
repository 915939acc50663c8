"""Global HE operation counters (ref OperationsCount,
`AtomicSealBfvVector.cs:211-294`).

The reference guards these with [Conditional("DEBUG")] and Interlocked
adds; here counting is cheap trace-time Python.  `OPS.count` fires while
a program is TRACED; `utils.hoist.hoist_jit` snapshots the counts each
trace accumulates and replays them on every cached call, so totals stay
truthful for record 1 and record N alike.  (Eager/unjitted paths count
every executed op directly.)"""

from __future__ import annotations

import atexit
from collections import Counter


class OperationsCount:
    def __init__(self):
        self.counters = Counter()
        self.enabled = True

    def count(self, name: str, n: int = 1):
        if self.enabled:
            self.counters[name] += n

    def reset(self):
        snap = dict(self.counters)
        self.counters.clear()
        return snap

    def snapshot(self) -> dict:
        return dict(self.counters)

    def print(self, header: str = ""):
        if header:
            print(header)
        for k in sorted(self.counters):
            print(f"  {k:24s} {self.counters[k]}")


OPS = OperationsCount()
_totals = Counter()


def accumulate_totals():
    _totals.update(OPS.counters)


@atexit.register
def _print_totals():  # process-exit dump like the reference (:217-225)
    if _totals:
        print("HE operation totals:")
        for k in sorted(_totals):
            print(f"  {k:24s} {_totals[k]}")
