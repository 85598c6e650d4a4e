"""Tracing / profiling utilities.

The reference has no tracing beyond ad-hoc time.time() prints
(natural_train.py:129, SURVEY 5).  Here:

  * ``trace(logdir)``     — context manager around jax.profiler traces
                            (view with TensorBoard / xprof).
  * ``StageTimer``        — per-stage wall timers with device sync, used by
                            the CLIs' verbose modes.
  * ``annotate(name)``    — jax.profiler.TraceAnnotation passthrough so
                            stages show up on the trace timeline.
"""

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating wall timers; blocks on device completion so stage times
    are real.  Usage:

        t = StageTimer()
        with t.stage("forward"):
            out = model.score(x)
        print(t.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: total {tot:.3f}s over {n} calls "
                         f"({tot / n * 1000:.2f} ms/call)")
        return "\n".join(lines)
