"""Dev driver: large-M analytic training on the real TPU via the f32
tree-packed Cholesky + refinement-CG path (solvers/analytic.py).

Run (serialize with all other TPU work):
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 2400 \
        python tests/dev_tree_analytic_tpu.py [M ...]
"""
import sys
import timeit

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_enable_x64', True)

import logging
logging.basicConfig(level=logging.INFO, format='[%(levelname)s] %(message)s')

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.ops.descriptor import descriptor_batch
from sgdml_tpu.solvers.analytic import Analytic
from sgdml_tpu.solvers.iterative import _matvec_A


def run(m, n_atoms=21, sig=20.0, lam=1e-10, dense_too=False, seed=0):
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 50, seed=seed)
    R = ds['R'][:m].reshape(m, -1)
    F = ds['F'][:m]
    t0 = timeit.default_timer()
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    X.block_until_ready()
    print(f'descriptors: {timeit.default_timer()-t0:.2f} s', flush=True)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]

    y_std = float(np.std(F))
    y = F.reshape(-1) / y_std
    task = {'sig': sig, 'lam': lam, 'R_train': np.zeros((m, n_atoms, 3)),
            'use_E_cstr': False}

    n = m * 3 * n_atoms
    print(f'=== M={m} n={n} ({n*n*4/1e9:.1f} GB dense f32, '
          f'{n*n*2/1e9:.1f} GB packed) ===', flush=True)

    solver = Analytic(max_memory=1e-9)  # force tree path
    t0 = timeit.default_timer()
    alphas = solver.solve(task, np.asarray(X), np.asarray(Jc), dperms, y)
    wall = timeit.default_timer() - t0
    print(f'tree-PCG total wall: {wall:.1f} s '
          f'(assemble+chol {solver.t_assemble:.1f}, cg {solver.t_solve:.1f}, '
          f'{solver.pcg_iters} iters)', flush=True)

    # True-system relative residual at the returned alphas (matrix-free f64).
    perms_key = (np.ascontiguousarray(dperms.astype(np.int64)).tobytes(),
                 dperms.shape)
    Av = _matvec_A(
        jnp.asarray(-alphas), X, Jc, X, Jc, sig, lam,
        n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=False,
    )
    rel = float(np.linalg.norm(np.asarray(Av) - y) / np.linalg.norm(y))
    print(f'true-system relative residual: {rel:.3e}', flush=True)

    if dense_too:
        solver64 = Analytic(max_memory=64)
        t0 = timeit.default_timer()
        alphas64 = solver64.solve(
            task, np.asarray(X), np.asarray(Jc), dperms, y
        )
        wall64 = timeit.default_timer() - t0
        dev = np.linalg.norm(alphas - alphas64) / np.linalg.norm(alphas64)
        print(f'dense-f64 total wall: {wall64:.1f} s '
              f'(assemble {solver64.t_assemble:.1f}, chol {solver64.t_solve:.1f}); '
              f'alpha rel dev tree-vs-f64: {dev:.3e}', flush=True)


if __name__ == '__main__':
    ms = [int(a) for a in sys.argv[1:]] or [200, 400, 1000]
    for m in ms:
        run(m, dense_too=(m <= 400))
