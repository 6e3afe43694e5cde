"""Hierarchical named timers.

Equivalent of /root/reference/mpi/ice_timers.F90 (:85-120 type, :324
start/stop, :665 print_all): named accumulating timers with a report table.
On TPU the async dispatch model means wall-clock timers must block on device
results to be meaningful; ``timer(..., block=x)`` does that. For kernel-level
profiling use jax.profiler traces (the xprof equivalent of the reference's
Score-P build, bld/Macros.scorep).
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Timer:
    name: str
    total: float = 0.0
    count: int = 0
    _t0: float = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self.total += time.perf_counter() - self._t0
        self.count += 1


class Timers:
    # the ~15 standard timer names (mpi/ice_timers.F90:172-178)
    STANDARD = ("Total", "TimeLoop", "Dynamics", "Advection", "Column",
                "Thermo", "Shortwave", "Ridging", "CatConv", "Couple",
                "ReadWrite", "Diags", "Bound", "BGC", "Forcing")

    def __init__(self):
        self._timers: dict[str, Timer] = {}

    def get(self, name: str) -> Timer:
        if name not in self._timers:
            self._timers[name] = Timer(name)
        return self._timers[name]

    @contextmanager
    def timer(self, name: str, block=None):
        t = self.get(name)
        t.start()
        try:
            yield
        finally:
            if block is not None:
                import jax
                jax.block_until_ready(block)
            t.stop()

    def report(self) -> str:
        lines = ["Timer                    total(s)    count   mean(ms)"]
        for t in sorted(self._timers.values(), key=lambda x: -x.total):
            mean = t.total / t.count * 1e3 if t.count else 0.0
            lines.append(f"{t.name:<22} {t.total:10.3f} {t.count:8d} "
                         f"{mean:10.2f}")
        return "\n".join(lines)
