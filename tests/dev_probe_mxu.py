"""Dev probe: MXU throughput by dtype + HBM size on the real TPU.

The axon tunnel's block_until_ready does not synchronize with device
execution — only a host transfer does. So every timing here fetches a
scalar to host, and throughput is computed from the SLOPE between two
iteration counts (cancels constant transfer/dispatch overhead).

Run directly (NOT under pytest — conftest pins the CPU platform):
    python tests/dev_probe_mxu.py
"""
import timeit

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_enable_x64', True)


def _chain_matmul(n, dtype, precision=None, preferred=None):
    k = jax.random.PRNGKey(0)
    if dtype in (jnp.int8,):
        a0 = jax.random.randint(k, (n, n), -127, 127, dtype=jnp.int8)
        b = jax.random.randint(k, (n, n), -127, 127, dtype=jnp.int8)
    else:
        a0 = jax.random.normal(k, (n, n), dtype=dtype)
        b = jax.random.normal(k, (n, n), dtype=dtype)

    def one(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=preferred,
        )

    import functools

    @functools.partial(jax.jit, static_argnames=('iters',))
    def chain(a, b, iters):
        def body(c, _):
            r = one(c, b)
            if dtype == jnp.int8:
                c2 = (r % 127).astype(jnp.int8)
            else:
                c2 = (r / (jnp.max(jnp.abs(r)) + 1)).astype(dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return c[0, 0]

    def run(iters):
        return float(chain(a0, b, iters))  # host fetch = true sync

    run(2); run(20)  # compile both
    t0 = timeit.default_timer(); run(2); t2 = timeit.default_timer() - t0
    t0 = timeit.default_timer(); run(20); t20 = timeit.default_timer() - t0
    per_iter = (t20 - t2) / 18
    return per_iter, 2 * n**3 / per_iter / 1e12


def _chain_chol(n, dtype):
    a = jax.random.normal(jax.random.PRNGKey(1), (n, n), dtype=jnp.float32).astype(dtype)
    spd = (a @ a.T + n * jnp.eye(n, dtype=dtype)).astype(dtype)

    import functools

    @functools.partial(jax.jit, static_argnames=('iters',))
    def chain(c, iters):
        def body(c, _):
            L = jnp.linalg.cholesky(c)
            return c + (jnp.abs(L) * 1e-16).astype(dtype), ()
        c, _ = jax.lax.scan(body, c, None, length=iters)
        return c[0, 0]

    def run(iters):
        return float(chain(spd, iters))

    run(1); run(5)
    t0 = timeit.default_timer(); run(1); t1 = timeit.default_timer() - t0
    t0 = timeit.default_timer(); run(5); t5 = timeit.default_timer() - t0
    per = (t5 - t1) / 4
    return per, n**3 / 3 / per / 1e12


def main():
    dev = jax.devices()[0]
    print('device:', dev, dev.device_kind, flush=True)

    n = 4096
    for name, dt_, prec, pref in [
        ('bf16->f32', jnp.bfloat16, None, jnp.float32),
        ('f32 default', jnp.float32, None, None),
        ('f32 HIGHEST', jnp.float32, jax.lax.Precision.HIGHEST, None),
        ('int8->int32', jnp.int8, None, jnp.int32),
        ('f64', jnp.float64, None, None),
    ]:
        try:
            t, tf = _chain_matmul(n, dt_, prec, pref)
            print(f'{name:14s} n={n}: {t*1e3:8.2f} ms/mm  {tf:8.2f} TFLOP/s', flush=True)
        except Exception as e:
            print(f'{name:14s} FAILED: {type(e).__name__}: {e}', flush=True)

    for n_, dt_ in [(8192, jnp.float64), (8192, jnp.float32)]:
        t, tf = _chain_chol(n_, dt_)
        print(f'{np.dtype(dt_).name} cholesky n={n_}: {t*1e3:8.1f} ms  {tf:.2f} TFLOP/s', flush=True)

    # HBM: largest single buffer via jnp.full (no temporaries)
    for gib in (8, 10, 11, 12, 13, 14):
        try:
            x = jnp.full((gib * 1024**3 // 4,), 3.0, dtype=jnp.float32)
            s = float(x[-1]); del x
            print(f'alloc {gib} GiB: ok ({s})', flush=True)
        except Exception as e:
            print(f'alloc {gib} GiB: FAILED {type(e).__name__}', flush=True)
            break


if __name__ == '__main__':
    main()
