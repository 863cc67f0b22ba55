"""Round-3 TPU measurements: Ozaki iterative-solver paths vs f64.

Run manually on the real chip (serialize with all other TPU work):

    python tests/dev_ozaki_round3_tpu.py matvec     # CG matvec iter/s
    python tests/dev_ozaki_round3_tpu.py factor     # Woodbury apply
    python tests/dev_ozaki_round3_tpu.py assembly   # pair assembly mm
    python tests/dev_ozaki_round3_tpu.py cg         # end-to-end CG solve

Each prints timing rows for BENCH_NOTES.md (VERDICT round-2 item #2).
"""

import sys
import timeit

import numpy as np


def _slope_time(f, reps_lo=5, reps_hi=25):
    """Per-call seconds via slope timing with host-fetch sync.

    Through the axon tunnel ``block_until_ready`` does not reliably
    block (BENCH_NOTES.md round 2); a host transfer does. Timing two
    different repetition counts and taking the slope cancels the fixed
    dispatch+fetch latency.
    """
    import timeit

    import jax

    def run(reps):
        t0 = timeit.default_timer()
        out = None
        for _ in range(reps):
            out = f()
        np.asarray(jax.device_get(out.ravel()[0]))
        return timeit.default_timer() - t0

    run(2)  # warm queue
    t_lo = run(reps_lo)
    t_hi = run(reps_hi)
    return max((t_hi - t_lo) / (reps_hi - reps_lo), 1e-9)


def _setup(n_atoms=21, m=1000, seed=10):
    import jax.numpy as jnp

    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.ops.descriptor import descriptor_batch

    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 200, seed=seed)
    R = ds['R'][:m].reshape(m, -1)
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]
    F = ds['F'][:m]
    return ds, X, Jc, dperms, F


def bench_matvec():
    """A-matvec (the CG iteration's dominant cost): native f64 vs ozaki."""
    import jax
    import jax.numpy as jnp

    from sgdml_tpu.solvers.iterative import _matvec_A

    for n_atoms, m in ((21, 1000), (60, 3000)):
        ds, X, Jc, dperms, F = _setup(n_atoms, m)
        pk = (
            np.ascontiguousarray(dperms.astype(np.int64)).tobytes(),
            dperms.shape,
        )
        v = jnp.asarray(np.random.default_rng(0).normal(size=(m * 3 * n_atoms,)))
        for mm in ('native', 'ozaki'):
            f = lambda: _matvec_A(
                v, X, Jc, X, Jc, 15.0, 1e-8, n_atoms=n_atoms,
                desc_perms_key=pk, use_E_cstr=False, mm=mm,
            )
            dt = _slope_time(f)
            print('matvec N=%d M=%d mm=%-6s  %.4f s/matvec (%.1f iter/s)'
                  % (n_atoms, m, mm, dt, 1.0 / dt))


def bench_factor():
    """Woodbury apply: chunked f64 vs int8 slice stack, MD17-like shape."""
    import jax
    import jax.numpy as jnp

    from sgdml_tpu.ops import ozaki
    from sgdml_tpu.solvers.iterative import (
        _SOLVE_CHUNK, _factor_apply, _factor_apply_ozaki,
    )

    k, n = 1440, 64512  # ~MD17 aspirin M=1024-class factor, chunk-aligned
    rng = np.random.default_rng(1)
    F = jnp.asarray(rng.normal(size=(k, n)))
    v = jnp.asarray(rng.normal(size=(n,)))

    f64_apply = jax.jit(_factor_apply)
    t_f64 = _slope_time(lambda: f64_apply(F, v))

    s_chunks, sigs = [], []
    for c0 in range(0, n, _SOLVE_CHUNK):
        s, sg = ozaki.split_global_int8(F[:, c0:c0 + _SOLVE_CHUNK], n_slices=8)
        s_chunks.append(s); sigs.append(sg)
    sF = jnp.concatenate(s_chunks, axis=2)
    sigF = jnp.stack(sigs)
    oz_apply = jax.jit(_factor_apply_ozaki)
    t_oz = _slope_time(lambda: oz_apply(sF, sigF, v))

    out = f64_apply(F, v)
    out2 = oz_apply(sF, sigF, v)
    err = float(jnp.max(jnp.abs(out2 - out)) / jnp.max(jnp.abs(out)))
    print('factor apply (k=%d, n=%d): f64 %.4f s  ozaki %.4f s  (%.2fx, '
          'rel err %.1e)' % (k, n, t_f64, t_oz, t_f64 / t_oz, err))


def bench_assembly():
    """Pair-grid assembly: native emulated-f64 tiles vs mm='ozaki'."""
    import jax.numpy as jnp

    from sgdml_tpu.ops import blockchol as bc
    from sgdml_tpu.ops.kernel import assemble_kernel_grid_pair

    n_atoms, m = 21, 1000
    ds, X, Jc, dperms, F = _setup(n_atoms, m)
    dim_i = 3 * n_atoms
    m_pad = -(-m // 8) * 8
    spec = bc.grid_spec(m_pad * dim_i, target_block=4096, align=dim_i)

    for mm in ('native', 'ozaki'):
        t0 = timeit.default_timer()
        Ghi, Glo = assemble_kernel_grid_pair(
            X, Jc, dperms, 20.0, n_atoms, spec, mm=mm
        )
        bc.sync(Ghi[-1][-1])
        dt = timeit.default_timer() - t0
        print('pair assembly n=%d mm=%-6s  %.1f s' % (spec.n, mm, dt))
        del Ghi, Glo


def bench_cg():
    """End-to-end iterative solve: factor_mode f64 vs ozaki (auto on TPU)."""
    from sgdml_tpu.solvers.iterative import Iterative
    from sgdml_tpu.train import GDMLTrain

    n_atoms, m = 21, 1000
    ds, X, Jc, dperms, F = _setup(n_atoms, m)
    trainer = GDMLTrain(max_memory=15.5)
    np.random.seed(1)
    task = trainer.create_task(
        ds, m, ds, 200, sig=15.0, lam=1e-8, use_sym=False, use_E=True
    )
    y = task['F_train'].reshape(-1) / np.std(task['F_train'])
    for mode in ('f64', 'ozaki'):
        np.random.seed(2)
        solver = Iterative(trainer, max_memory=15.5, factor_mode=mode)
        t0 = timeit.default_timer()
        out = solver.solve(task, np.asarray(X[:m]), np.asarray(Jc[:m]),
                           dperms, y, 1.0, max_seconds=1200)
        dt = timeit.default_timer() - t0
        print('cg solve N=%d M=%d mode=%-6s  %.1f s, %d iters, conv=%s'
              % (n_atoms, m, mode, dt, out[2], out[6]))


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'matvec'
    dict(matvec=bench_matvec, factor=bench_factor,
         assembly=bench_assembly, cg=bench_cg)[which]()
