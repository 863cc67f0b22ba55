"""Dev utility: compile + validate + time the Pallas fused inference
kernel on real TPU hardware, vs the XLA f32 and f64 paths, at
aspirin-sized and MD22-AT-AT-sized tables (pay-or-park evidence for
VERDICT #7 / ROADMAP #2)."""

import pathlib
import sys
import timeit

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import sgdml_tpu  # noqa: F401
from sgdml_tpu.ops import descriptor as desc_ops
from sgdml_tpu.ops.pallas_predict import pallas_predict_tables
from sgdml_tpu.predict import predict_from_tables


def main(n_atoms=21, m=1000, p=6, B=1024):
    print('=== N=%d M=%d P=%d B=%d ===' % (n_atoms, m, p, B), flush=True)
    dim_d = n_atoms * (n_atoms - 1) // 2
    T = m * p
    rng = np.random.default_rng(0)

    Xq = jnp.asarray(rng.normal(size=(B, dim_d)) * 0.3 + 1.0)
    Jcq = jnp.asarray(rng.normal(size=(B, dim_d, 3)) * 0.1)
    Xt = jnp.asarray(rng.normal(size=(T, dim_d)) * 0.3 + 1.0)
    JA = jnp.asarray(rng.normal(size=(T, dim_d)))
    sig = 15.0

    # XLA f64
    t0 = timeit.default_timer()
    E64, F64 = predict_from_tables(
        Xq, Jcq, Xt, JA, None, sig, 1.0, 0.0, n_atoms=n_atoms
    )
    E64.block_until_ready()
    print('xla f64 compile+run: %.1fs' % (timeit.default_timer() - t0),
          flush=True)
    t0 = timeit.default_timer()
    for _ in range(5):
        E64, F64 = predict_from_tables(
            Xq, Jcq, Xt, JA, None, sig, 1.0, 0.0, n_atoms=n_atoms
        )
        np.asarray(E64)  # force real completion (block_until_ready lies on tunnels)
    t64 = (timeit.default_timer() - t0) / 5
    print('xla f64 steady: %.4fs  (%.0f geoms/s)' % (t64, B / t64), flush=True)

    # XLA f32
    Xq32, Jcq32 = Xq.astype(jnp.float32), Jcq.astype(jnp.float32)
    Xt32, JA32 = Xt.astype(jnp.float32), JA.astype(jnp.float32)
    E32, F32 = predict_from_tables(
        Xq32, Jcq32, Xt32, JA32, None, sig, 1.0, 0.0, n_atoms=n_atoms
    )
    E32.block_until_ready()
    t0 = timeit.default_timer()
    for _ in range(5):
        E32, F32 = predict_from_tables(
            Xq32, Jcq32, Xt32, JA32, None, sig, 1.0, 0.0, n_atoms=n_atoms
        )
        np.asarray(E32)
    t32 = (timeit.default_timer() - t0) / 5
    print('xla f32 steady: %.4fs  (%.0f geoms/s)' % (t32, B / t32), flush=True)

    # Pallas f32
    t0 = timeit.default_timer()
    Ep, Fd = pallas_predict_tables(Xq32, Xt32, JA32, sig)
    Ep.block_until_ready()
    print('pallas compile+run: %.1fs' % (timeit.default_timer() - t0),
          flush=True)
    t0 = timeit.default_timer()
    for _ in range(5):
        Ep, Fd = pallas_predict_tables(Xq32, Xt32, JA32, sig)
        np.asarray(Ep)
    tp = (timeit.default_timer() - t0) / 5
    print('pallas f32 steady: %.4fs  (%.0f geoms/s)' % (tp, B / tp),
          flush=True)

    # Correctness vs XLA f32 (compare raw E accumulator and F_d via J^T map)
    Fp = desc_ops.vec_dot_jac(Jcq32, Fd, n_atoms)
    e_err = float(jnp.abs(Ep - E32).max() / jnp.abs(E32).max())
    f_err = float(jnp.abs(Fp - F32).max() / jnp.abs(F32).max())
    print('pallas vs xla-f32: E rel %.2e, F rel %.2e' % (e_err, f_err),
          flush=True)


if __name__ == '__main__':
    import sys as _sys

    if len(_sys.argv) > 1 and _sys.argv[1] == 'md22':
        main(n_atoms=60, m=3000, p=1, B=512)
    elif len(_sys.argv) > 1 and _sys.argv[1] == 'both':
        main()
        main(n_atoms=60, m=3000, p=1, B=512)
    else:
        main()
