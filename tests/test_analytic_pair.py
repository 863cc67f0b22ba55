"""Pair-precision analytic path (ops/pairchol.py via Analytic):
end-to-end PCG parity with the dense f64 solve, multi-block grid."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.ops.descriptor import descriptor_batch
from sgdml_tpu.solvers.analytic import Analytic
from sgdml_tpu.solvers.iterative import _matvec_A


def _setup(m=40, n_atoms=5, seed=3):
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 4, seed=seed)
    R = ds['R'][:m].reshape(m, -1)
    F = ds['F'][:m]
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]
    return X, Jc, dperms, F


def test_pair_pcg_matches_dense_f64_solve():
    n_atoms, m, sig, lam = 5, 40, 4.0, 1e-10
    X, Jc, dperms, F = _setup(m, n_atoms)
    y = F.reshape(-1) / np.std(F)
    task = {
        'sig': sig,
        'lam': lam,
        'R_train': np.zeros((m, n_atoms, 3)),
        'use_E_cstr': False,
    }

    solver = Analytic(max_memory=64)
    # target_block=512 forces a k>=2 pair grid at CPU-test scale.
    alphas_pair = solver._solve_pair_pcg(
        task, np.asarray(X), np.asarray(Jc), dperms, y, sig, lam, n_atoms,
        target_block=512,
    )
    assert solver.pcg_iters > 0

    alphas_dense = Analytic(max_memory=64).solve(
        task, np.asarray(X), np.asarray(Jc), dperms, y
    )

    perms_key = (
        np.ascontiguousarray(dperms.astype(np.int64)).tobytes(), dperms.shape
    )

    def forces(a):
        return np.asarray(
            _matvec_A(
                jnp.asarray(-a), X, Jc, X, Jc, sig, 0.0,
                n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=False,
            )
        )

    f_pair, f_dense = forces(alphas_pair), forces(alphas_dense)
    rel = np.linalg.norm(f_pair - f_dense) / np.linalg.norm(f_dense)
    assert rel < 1e-6


def test_pair_memory_estimate_undercuts_dense():
    assert (
        Analytic.est_memory_pair(1000, 21)
        < Analytic.est_memory_requirement(1000, 21) / 2
    )


def test_pair_assembly_matches_dense_to_pair_floor():
    from sgdml_tpu.ops import blockchol, pairchol
    from sgdml_tpu.ops.kernel import assemble_kernel, assemble_kernel_grid_pair

    n_atoms, m, sig = 5, 16, 4.0
    X, Jc, dperms, _ = _setup(m, n_atoms)
    dim_i = 3 * n_atoms
    spec = blockchol.GridSpec(m * dim_i, 2)
    Ghi, Glo = assemble_kernel_grid_pair(
        np.asarray(X), np.asarray(Jc), dperms, sig, n_atoms, spec
    )
    K = np.asarray(assemble_kernel(X, Jc, dperms, sig, n_atoms))
    b = spec.b
    scale = np.abs(K).max()
    lo_mags = []
    for i in range(spec.k):
        for j in range(i + 1):
            got = np.asarray(pairchol.pair_to_f64(Ghi[i][j], Glo[i][j]))
            want = -K[i * b : (i + 1) * b, j * b : (j + 1) * b]
            assert np.abs(got - want).max() < 2.0 ** (-32) * scale
            lo_mags.append(np.abs(np.asarray(Glo[i][j], np.float64)).max())
    # The lo parts must carry real sub-f32 information.
    assert max(lo_mags) > 0


def test_pair_ladder_falls_back_to_f32_grid(monkeypatch):
    """If every pair lam' rung goes indefinite, the solver must fall
    back to the f32 grid path and still return a usable solution."""
    from sgdml_tpu.ops import pairchol
    from sgdml_tpu.solvers import analytic as am

    n_atoms, m, sig, lam = 5, 40, 4.0, 1e-10
    X, Jc, dperms, F = _setup(m, n_atoms)
    y = F.reshape(-1) / np.std(F)
    task = {'sig': sig, 'lam': lam,
            'R_train': np.zeros((m, n_atoms, 3)), 'use_E_cstr': False}

    def always_indefinite(Ghi, Glo, sync_every=16):
        k = len(Ghi)
        nan = jnp.full_like(Ghi[0][0], jnp.nan)
        bad = [[nan for _ in row] for row in Ghi]
        return bad, [[l for l in row] for row in Glo]

    monkeypatch.setattr(pairchol, 'chol_grid_pair', always_indefinite)
    solver = am.Analytic(max_memory=64)
    alphas = solver._solve_pair_pcg(
        task, np.asarray(X), np.asarray(Jc), dperms, y, sig, lam, n_atoms,
        target_block=512,
    )
    assert np.isfinite(alphas).all()
    # The fallback solve is the real f32-grid path: check it solved.
    from sgdml_tpu.solvers.iterative import _matvec_A

    perms_key = (
        np.ascontiguousarray(dperms.astype(np.int64)).tobytes(), dperms.shape
    )
    r = np.asarray(
        _matvec_A(
            jnp.asarray(-alphas), X, Jc, X, Jc, sig, lam,
            n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=False,
        )
    ) - y
    assert np.linalg.norm(r) / np.linalg.norm(y) < 1e-6


def test_pair_pcg_with_energy_constraints():
    """E-constrained system through the pair path: the force block is
    factored in pair precision and the (m, m) energy border carries a
    dense f64 factor; CG on the full bordered f64 system must match the
    dense solve (reference coverage: sgdml/train.py:235-300 E-constraint
    blocks x the analytic solver class)."""
    n_atoms, m, sig, lam = 5, 40, 4.0, 1e-10
    X, Jc, dperms, F = _setup(m, n_atoms)
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 4, seed=3)
    E = ds['E'][:m]
    std = np.std(F)
    y = np.concatenate([F.reshape(-1), -(E - E.mean())]) / std
    task = {
        'sig': sig,
        'lam': lam,
        'R_train': np.zeros((m, n_atoms, 3)),
        'use_E_cstr': True,
    }

    solver = Analytic(max_memory=64)
    alphas_pair = solver._solve_pair_pcg(
        task, np.asarray(X), np.asarray(Jc), dperms, y, sig, lam, n_atoms,
        target_block=512,
    )
    assert solver.pcg_iters > 0
    assert alphas_pair.shape == y.shape

    alphas_dense = Analytic(max_memory=64).solve(
        task, np.asarray(X), np.asarray(Jc), dperms, y
    )

    perms_key = (
        np.ascontiguousarray(dperms.astype(np.int64)).tobytes(), dperms.shape
    )

    def predictions(a):
        return np.asarray(
            _matvec_A(
                jnp.asarray(-a), X, Jc, X, Jc, sig, 0.0,
                n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=True,
            )
        )

    p_pair, p_dense = predictions(alphas_pair), predictions(alphas_dense)
    rel = np.linalg.norm(p_pair - p_dense) / np.linalg.norm(p_dense)
    assert rel < 1e-6, rel


def test_grid_pcg_with_energy_constraints_routing():
    """A large E-constrained system must route to the factored grid path
    (no silent fall-through to dense f64/CG) and reproduce the dense
    solution."""
    n_atoms, m, sig, lam = 5, 40, 4.0, 1e-10
    X, Jc, dperms, F = _setup(m, n_atoms)
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 4, seed=3)
    E = ds['E'][:m]
    y = np.concatenate([F.reshape(-1), -(E - E.mean())]) / np.std(F)
    task = {
        'sig': sig,
        'lam': lam,
        'R_train': np.zeros((m, n_atoms, 3)),
        'use_E_cstr': True,
    }

    # Tiny budget: Analytic.solve must route through the factored path.
    small = Analytic(max_memory=1e-9)
    alphas_grid = small.solve(task, np.asarray(X), np.asarray(Jc), dperms, y)
    assert small.pcg_iters > 0  # factored path actually ran

    alphas_dense = Analytic(max_memory=64).solve(
        task, np.asarray(X), np.asarray(Jc), dperms, y
    )
    perms_key = (
        np.ascontiguousarray(dperms.astype(np.int64)).tobytes(), dperms.shape
    )

    def predictions(a):
        return np.asarray(
            _matvec_A(
                jnp.asarray(-a), X, Jc, X, Jc, sig, 0.0,
                n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=True,
            )
        )

    rel = np.linalg.norm(
        predictions(alphas_grid) - predictions(alphas_dense)
    ) / np.linalg.norm(predictions(alphas_dense))
    assert rel < 1e-6, rel
