"""Profiling and phase timing.

The reference self-instruments with ad-hoc ``timeit`` spans reported
through its callback protocol (e.g. sgdml/train.py:1491-1528,
sgdml/solvers/analytic.py:75,140). Here the equivalents are:

* :class:`PhaseTimer` — named wall-clock spans with a summary table,
  used by the training pipeline and benchmarks;
* :func:`trace` — a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace (XLA op-level timeline), replacing
  the reference's absent profiler integration.
"""

from __future__ import annotations

import contextlib
import logging
import timeit

log = logging.getLogger(__name__)


class PhaseTimer:
    """Accumulate named wall-clock phases.

    >>> t = PhaseTimer()
    >>> with t.phase('assembly'): ...
    >>> t.summary()
    """

    def __init__(self):
        self.durations: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = timeit.default_timer()
        try:
            yield
        finally:
            dt = timeit.default_timer() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        total = sum(self.durations.values())
        lines = ['%-32s %9s %6s %6s' % ('phase', 'seconds', 'calls', '%')]
        for name, dur in sorted(
            self.durations.items(), key=lambda kv: -kv[1]
        ):
            lines.append(
                '%-32s %9.3f %6d %5.1f%%'
                % (name, dur, self.counts[name], 100 * dur / max(total, 1e-12))
            )
        lines.append('%-32s %9.3f' % ('total', total))
        return '\n'.join(lines)

    def log_summary(self, level=logging.INFO):
        for line in self.summary().splitlines():
            log.log(level, line)


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/sgdml_tpu_trace'):
    """Capture a device trace viewable in TensorBoard / Perfetto.

    >>> with trace('/tmp/tr'): model = trainer.train(task)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info('Device trace written to %s', log_dir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in device traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
