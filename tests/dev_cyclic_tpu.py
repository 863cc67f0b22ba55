"""Measure the block-cyclic shrinking-update Cholesky vs the masked
full-width design on the real TPU chip (serialize with other TPU work):

    python tests/dev_cyclic_tpu.py [n nb]

The cyclic program does the minimal n^3/3 update flops (Python-unrolled
shrinking steps) where the masked ``fori_loop`` design does ~n^3; on one
device the expected steady-state ratio is ~2-3x (some of the masked
program's flops are the cheap panel solves either way). Slope-timed with
host-fetch sync (BENCH_NOTES round-2 convention: ``block_until_ready``
does not synchronize through the axon tunnel).
"""

import sys
import timeit

import numpy as np


def _slope_time(f, reps_lo=2, reps_hi=6):
    import jax

    def run(reps):
        t0 = timeit.default_timer()
        out = None
        for _ in range(reps):
            out = f()
        np.asarray(jax.device_get(out.ravel()[0]))
        return timeit.default_timer() - t0

    run(1)  # warm queue + compile
    t_lo = run(reps_lo)
    t_hi = run(reps_hi)
    return max((t_hi - t_lo) / (reps_hi - reps_lo), 1e-9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_enable_x64', True)
    from sgdml_tpu.ops import cyclic, linalg
    from sgdml_tpu.parallel.mesh import default_mesh

    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, n))
    A = jnp.asarray(B @ B.T + n * np.eye(n))
    mesh = default_mesh(1)

    t0 = timeit.default_timer()
    masked = jax.jit(lambda a: linalg.blocked_cholesky(a, nb))
    L_m = masked(A)
    np.asarray(jax.device_get(L_m.ravel()[0]))
    print('masked compile+first run: %.1f s' % (timeit.default_timer() - t0))

    t0 = timeit.default_timer()
    L_c = cyclic.blocked_cholesky_cyclic(A, nb, mesh)
    np.asarray(jax.device_get(L_c.ravel()[0]))
    print('cyclic compile+first run: %.1f s (unrolled %d steps)'
          % (timeit.default_timer() - t0, n // nb))

    err = float(jnp.max(jnp.abs(L_m - L_c)))
    print('max |L_masked - L_cyclic| = %.3e' % err)

    t_masked = _slope_time(lambda: masked(A))
    t_cyclic = _slope_time(lambda: cyclic.blocked_cholesky_cyclic(A, nb, mesh))
    fl = n**3 / 3
    print('n=%d nb=%d (f64, 1 device):' % (n, nb))
    print('  masked full-width: %.3f s  (%.2f TFLOP/s of minimal flops)'
          % (t_masked, fl / t_masked / 1e12))
    print('  cyclic shrinking : %.3f s  (%.2f TFLOP/s of minimal flops)'
          % (t_cyclic, fl / t_cyclic / 1e12))
    print('  speedup: %.2fx' % (t_masked / t_cyclic))


if __name__ == '__main__':
    main()
