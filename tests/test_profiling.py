"""Profiling utilities: phase timers and trace annotation."""

import time

from sgdml_tpu.utils.profiling import PhaseTimer, annotate


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase('a'):
        time.sleep(0.01)
    with t.phase('a'):
        time.sleep(0.01)
    with t.phase('b'):
        pass
    assert t.counts['a'] == 2
    assert t.durations['a'] >= 0.02
    s = t.summary()
    assert 'a' in s and 'total' in s


def test_annotate_context():
    import jax.numpy as jnp

    with annotate('test-region'):
        x = jnp.ones(4).sum()
    assert float(x) == 4.0
