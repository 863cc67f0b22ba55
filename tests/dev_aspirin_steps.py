"""Dev utility: stage-by-stage timing of the aspirin-sized iterative
pipeline on the current device (compile-time and OOM triage)."""

import pathlib
import sys
import timeit

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp

import sgdml_tpu  # noqa: F401  (enables x64 + compile cache)
from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.ops import descriptor as desc_ops
from sgdml_tpu.solvers.iterative import Iterative, _matvec_A
from sgdml_tpu.train import desc_perm_table


def t(msg, t0):
    print('%s: %.1fs' % (msg, timeit.default_timer() - t0), flush=True)


def main(m=1000, n_atoms=21, sig=15.0, lam=1e-8):
    t0 = timeit.default_timer()
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 1200, seed=10)
    t('dataset', t0)

    dim_i = 3 * n_atoms
    R = ds['R'][:m].reshape(m, -1)
    t0 = timeit.default_timer()
    X, Jc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    X.block_until_ready()
    t('descriptors', t0)
    dperms = desc_perm_table(np.arange(n_atoms)[None]).astype(np.int64)
    perms_key = (np.ascontiguousarray(dperms).tobytes(), dperms.shape)

    y = ds['F'][:m].reshape(-1)
    y = y / y.std()
    t0 = timeit.default_timer()
    out = _matvec_A(
        jnp.asarray(y), X, Jc, sig, lam,
        n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=False,
    )
    out.block_until_ready()
    t('matvec compile+run', t0)

    solver = Iterative(max_memory=12)
    n_ind = Iterative.max_n_inducing_pts(m, n_atoms, 12 * 1024**3)
    print('n_ind:', n_ind, flush=True)

    np.random.seed(0)
    t0 = timeit.default_timer()
    lev = solver._lev_scores(X, Jc, dperms, sig, lam, n_ind, n_atoms, False)
    t('lev scores', t0)

    idxs = solver.inducing_pts_from_lev_scores(
        lev[: m * dim_i], n_ind * dim_i
    )
    t0 = timeit.default_timer()
    Fp, lev2 = solver._build_factor(
        X, Jc, dperms, sig, lam, idxs, n_atoms, False
    )
    Fp.block_until_ready()
    t('factor build', t0)
    print('Fp shape', Fp.shape, flush=True)

    # One CG chunk compile+run.
    from sgdml_tpu.solvers.iterative import _pcg_chunk_jit, CG_CHUNK_ITERS

    def A_apply(v):
        return _matvec_A(
            v, X, Jc, sig, lam,
            n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=False,
        )

    b = jnp.asarray(y)
    b_norm = float(np.linalg.norm(y))

    def pcg(state, Fp_cur):
        return _pcg_chunk_jit(False)(
            state, Fp_cur, X, Jc, X, Jc, sig, lam, b_norm, 1e-4,
            n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=False,
            chunk_iters=CG_CHUNK_ITERS,
        )

    r = b - A_apply(jnp.zeros_like(b))
    corr = (Fp.T @ (Fp @ r)).astype(r.dtype)
    z = (r - corr) / lam
    state = (jnp.zeros_like(b), r, z, z, r @ z, 0, jnp.zeros(CG_CHUNK_ITERS))
    t0 = timeit.default_timer()
    state = pcg(state, Fp)
    state[0].block_until_ready()
    t('cg chunk (50 iters) compile+run', t0)
    t0 = timeit.default_timer()
    state = pcg(state, Fp)
    state[0].block_until_ready()
    t('cg chunk (50 iters) steady', t0)
    print('resid after 100 iters: %.3e (target %.3e)'
          % (float(jnp.linalg.norm(state[1])), 1e-4 * b_norm), flush=True)


if __name__ == '__main__':
    main()
