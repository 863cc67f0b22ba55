"""Iterative (Nystrom-pCG) solver tests: agreement with the analytic
solver's predictions, convergence, and warm-started resume."""

import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.predict import GDMLPredict
from sgdml_tpu.train import GDMLTrain


@pytest.fixture(scope='module')
def ds():
    return generate_md_dataset(n_atoms=6, n_frames=400, seed=4)


@pytest.fixture(scope='module')
def models(ds):
    trainer = GDMLTrain()
    np.random.seed(21)
    task = trainer.create_task(
        ds, 60, ds, 20, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    m_analytic = trainer.train(dict(task), solver='analytic')
    np.random.seed(22)
    m_cg = trainer.train(dict(task), solver='cg')
    return task, m_analytic, m_cg


def test_cg_converges(models):
    _, _, m_cg = models
    assert m_cg['solver_resid'] <= m_cg['solver_tol'] * m_cg['norm_y_train']


def test_cg_matches_analytic_predictions(ds, models):
    task, m_analytic, m_cg = models
    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:40]
    R_test = ds['R'][ti].reshape(len(ti), -1)

    Ea, Fa = GDMLPredict(m_analytic).predict(R_test)
    Ec, Fc = GDMLPredict(m_cg).predict(R_test)

    f_scale = np.abs(Fa).mean()
    assert np.abs(Fc - Fa).mean() / f_scale < 5e-3
    assert np.abs((Ec - Ec.mean()) - (Ea - Ea.mean())).mean() < 1e-2


def test_cg_force_accuracy(ds, models):
    task, _, m_cg = models
    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:40]
    _, F = GDMLPredict(m_cg).predict(ds['R'][ti].reshape(len(ti), -1))
    f_ref = ds['F'][ti].reshape(len(ti), -1)
    mae = np.abs(F - f_ref).mean()
    assert mae < 0.08 * np.abs(f_ref).mean(), mae


def test_resume_warm_start(ds, models):
    """create_task_from_model -> train continues from stored alphas and
    converges in fewer iterations than from scratch."""
    task, _, m_cg = models
    trainer = GDMLTrain()
    resumed_task = trainer.create_task_from_model(m_cg, ds)
    assert 'alphas0_F' in resumed_task
    np.random.seed(23)
    m2 = trainer.train(resumed_task, solver='cg')
    # Warm-started from a converged solution: should converge immediately.
    assert m2['solver_iters'] - m_cg['solver_iters'] <= 5
    assert m2['solver_resid'] <= m2['solver_tol'] * m2['norm_y_train']


def _stall_solve(ds, monkeypatch, max_memory, max_restarts=3,
                 warm_k=None):
    """Run a solve whose effectiveness monitor reports a stall after every
    chunk (threshold forced to 100), with a tolerance too tight to reach —
    so the restart machinery must fire and must terminate the solve.
    ``warm_k``: seed the task with a warm-start inducing set of that many
    points (below the cap), the configuration where stall growth
    re-engages (fresh solves start AT the cap and only re-seed)."""
    from sgdml_tpu.solvers import iterative as it_mod

    monkeypatch.setattr(it_mod, 'CG_STEPS_HIST_LEN', 4)
    monkeypatch.setattr(it_mod, 'EFF_RESTART_THRESH', 100)
    monkeypatch.setattr(it_mod, 'MAX_NUM_RESTARTS', max_restarts)
    monkeypatch.setattr(it_mod, 'CG_CHUNK_ITERS', 5)

    trainer = GDMLTrain(max_memory=max_memory)
    np.random.seed(41)
    task = trainer.create_task(
        ds, 24, ds, 8, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    if warm_k is not None:
        dim_i0 = 3 * ds['R'].shape[1]
        rng = np.random.default_rng(0)
        task['inducing_pts_idxs'] = rng.choice(
            24 * dim_i0, warm_k * dim_i0, replace=False
        )
    from sgdml_tpu.ops import descriptor as desc_ops
    import jax.numpy as jnp

    n_train, n_atoms = task['R_train'].shape[:2]
    R = task['R_train'].reshape(n_train, -1)
    R_desc, R_d_desc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(desc_ops.descriptor_dim(n_atoms))[None, :]
    y = task['F_train'].ravel()
    y_std = float(np.std(y))

    solver = it_mod.Iterative(trainer, max_memory=max_memory)
    # tol=0 is unreachable by construction: every chunk "stalls" under the
    # forced threshold, so the restart machinery must terminate the solve.
    return it_mod.Iterative.max_n_inducing_pts(
        n_train, n_atoms, max_memory * 1024**3
    ), solver.solve(
        task, np.asarray(R_desc), np.asarray(R_d_desc), dperms, y / y_std,
        y_std, tol=0.0,
    )


def test_cg_restart_grows_k_and_terminates(ds, monkeypatch, caplog):
    """Stalls trigger preconditioner-strengthening restarts: k grows 1.2x
    per restart and the solve exits after MAX_NUM_RESTARTS instead of
    grinding to max_iters (reference: sgdml/solvers/iterative.py:729-804)."""
    import logging

    with caplog.at_level(logging.INFO, logger='sgdml_tpu.solvers.iterative'):
        # Warm-start with k=4 points, well below the cap: stall growth
        # must re-engage, bounded by the budget cap.
        k_init, out = _stall_solve(
            ds, monkeypatch, max_memory=0.005, warm_k=4
        )
    alphas, tol, num_iters, resid, train_rmse, ind_idxs, is_conv = out

    assert not is_conv  # tol=0 is unreachable
    assert np.isfinite(alphas).all()
    # The solve terminated after a handful of chunks, not max_iters.
    assert num_iters <= 5 * 5
    restarts = [r for r in caplog.records if 'restarting with k=' in r.message]
    assert restarts, 'no preconditioner-strengthening restart fired'
    # k actually grew beyond the warm-start choice, within the cap.
    dim_i = 3 * ds['R'].shape[1]
    assert len(ind_idxs) // dim_i > 4
    assert len(ind_idxs) // dim_i <= k_init


def test_cg_restart_bounded_at_memory_cap(ds, monkeypatch, caplog):
    """A capped solve WITHOUT a wall budget must enter the stagnation
    policy (adaptive window -> one re-seed -> precision ladder ->
    bounded grind), NOT the legacy counted-restart give-up: the policy
    that converged MD22 M=3000 must be the one a plain ``train()`` call
    runs (round-3 verdict weak #2 — the give-up path provably fails
    exactly at the cap)."""
    import logging

    from sgdml_tpu.solvers import iterative as it_mod

    # Window 0 so the stagnation ladder engages within a few chunks.
    monkeypatch.setattr(it_mod, 'RESEED_STAGNATION_ITERS', 0)
    with caplog.at_level(logging.INFO, logger='sgdml_tpu.solvers.iterative'):
        # Fresh solves start AT the cap: every stall must take the
        # stagnation-policy branch. No max_seconds on purpose.
        grow_cap, out = _stall_solve(ds, monkeypatch, max_memory=0.02)
    alphas, tol, num_iters, resid, train_rmse, ind_idxs, is_conv = out

    assert not is_conv  # tol=0 is unreachable
    assert np.isfinite(alphas).all()
    reseeds = [r for r in caplog.records if 'memory cap' in r.message]
    assert reseeds, 'cap re-seed (stagnation policy) never fired'
    # Terminated by the deep-stagnation bound, never the restart counter.
    assert any('deep-stagnation' in r.message for r in caplog.records)
    assert not any(
        'stalled %d times' % 3 in r.message for r in caplog.records
    )


def test_cg_budgeted_reseeds_not_counted_against_restarts(
    ds, monkeypatch, caplog
):
    """With a wall-clock budget, cap-bounded re-seeds (cheap: one exact
    matvec) are NOT counted against MAX_NUM_RESTARTS: the solve keeps
    re-seeding while each cycle improves the best residual, bounded by
    max_seconds — the round-3 M=3000 failure burned its 6 restarts on a
    healthy oscillating solve and gave up at 4x the reachable residual."""
    import logging

    from sgdml_tpu.solvers import iterative as it_mod

    monkeypatch.setattr(it_mod, 'CG_STEPS_HIST_LEN', 4)
    monkeypatch.setattr(it_mod, 'EFF_RESTART_THRESH', 100)  # stall always
    monkeypatch.setattr(it_mod, 'MAX_NUM_RESTARTS', 2)
    monkeypatch.setattr(it_mod, 'CG_CHUNK_ITERS', 5)
    monkeypatch.setattr(it_mod, 'RESEED_STAGNATION_ITERS', 0)
    # Pin the inducing-point budget WELL below n_train: at k == n_train
    # the Nystrom preconditioner is exact, CG reaches machine precision
    # in a few chunks and numerical breakdown preempts the re-seed
    # cycles this test is about.
    monkeypatch.setattr(
        it_mod.Iterative, 'max_n_inducing_pts',
        staticmethod(lambda *a, **k: 3),
    )

    trainer = GDMLTrain(max_memory=0.02)
    np.random.seed(44)
    task = trainer.create_task(
        ds, 24, ds, 8, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    from sgdml_tpu.ops import descriptor as desc_ops
    import jax.numpy as jnp

    n_train, n_atoms = task['R_train'].shape[:2]
    R = task['R_train'].reshape(n_train, -1)
    R_desc, R_d_desc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(desc_ops.descriptor_dim(n_atoms))[None, :]
    y = task['F_train'].ravel()
    y_std = float(np.std(y))

    solver = it_mod.Iterative(trainer, max_memory=0.02)
    with caplog.at_level(logging.INFO, logger='sgdml_tpu.solvers.iterative'):
        out = solver.solve(
            task, np.asarray(R_desc), np.asarray(R_d_desc), dperms,
            y / y_std, y_std, tol=0.0, max_seconds=12.0,
        )
    num_iters = out[2]
    reseeds = [
        r for r in caplog.records if 'memory cap' in r.message
    ]
    # The solve re-seeded at least as often as MAX_NUM_RESTARTS (=2)
    # would allow (every chunk is a forced stall), kept going past the
    # bound, and exited on the wall budget — not the restart counter.
    assert len(reseeds) >= 2, len(reseeds)
    assert num_iters > 2 * 5
    # Never a restart-counter give-up (deep-stagnation give-up is fine:
    # tol=0 is unreachable, so the solve legitimately floors eventually).
    assert not any(
        'stalled %d times' % 2 in r.message for r in caplog.records
    )


def test_cg_deep_stagnation_terminates(ds, monkeypatch, caplog):
    """Budgeted grinding must still terminate when the solve is truly
    stuck: with the iterate corrupted at EVERY matvec precision the best
    residual never improves, so the solver re-seeds once, climbs the
    whole precision ladder, and then gives up at the deep-stagnation
    limit instead of spinning out the full wall budget."""
    import logging

    from sgdml_tpu.solvers import iterative as it_mod

    orig_jit = it_mod._pcg_chunk_jit

    def always_floored(pin_stack):
        f = orig_jit(pin_stack)

        def call(state, Fp, *a, **k):
            x, r, z, p, rz, it, hist, n_bad = f(state, Fp, *a, **k)
            return (x * 1.02, r, z, p, rz, it, hist, n_bad)

        return call

    monkeypatch.setattr(it_mod, '_pcg_chunk_jit', always_floored)
    monkeypatch.setattr(it_mod, 'CG_STEPS_HIST_LEN', 4)
    monkeypatch.setattr(it_mod, 'EFF_RESTART_THRESH', 100)
    monkeypatch.setattr(it_mod, 'CG_CHUNK_ITERS', 5)
    monkeypatch.setattr(it_mod, 'RESEED_STAGNATION_ITERS', 0)

    trainer = GDMLTrain(max_memory=0.02)
    np.random.seed(45)
    task = trainer.create_task(
        ds, 24, ds, 8, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    from sgdml_tpu.ops import descriptor as desc_ops
    import jax.numpy as jnp

    n_train, n_atoms = task['R_train'].shape[:2]
    R = task['R_train'].reshape(n_train, -1)
    R_desc, R_d_desc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(desc_ops.descriptor_dim(n_atoms))[None, :]
    y = task['F_train'].ravel()
    y_std = float(np.std(y))

    solver = it_mod.Iterative(trainer, max_memory=0.02)
    with caplog.at_level(logging.INFO, logger='sgdml_tpu.solvers.iterative'):
        out = solver.solve(
            task, np.asarray(R_desc), np.asarray(R_d_desc), dperms,
            y / y_std, y_std, tol=0.0, max_seconds=60.0,
        )
    assert np.isfinite(out[0]).all()
    assert any('deep-stagnation' in r.message for r in caplog.records)


def test_cg_matvec_precision_ladder_escapes_floor(ds, monkeypatch, caplog):
    """A too-coarse CG matvec floors the residual (inexact-Krylov
    stagnation — the MD22 M=3000 failure at 6 int8 slices); instead of
    giving up, barren re-seed cycles must climb MV_MM_LADDER and the
    solve must then truly converge. Simulated by corrupting the iterate
    2% per chunk at the first rung only."""
    import logging

    from sgdml_tpu.solvers import iterative as it_mod

    orig_jit = it_mod._pcg_chunk_jit

    def rung_limited(pin_stack):
        f = orig_jit(pin_stack)

        def call(state, Fp, *a, **k):
            x, r, z, p, rz, it, hist, n_bad = f(state, Fp, *a, **k)
            if k.get('mm') == 'ozaki':  # coarse rung: floored iterate
                x = x * 1.02
            return (x, r, z, p, rz, it, hist, n_bad)

        return call

    monkeypatch.setattr(it_mod, '_pcg_chunk_jit', rung_limited)
    monkeypatch.setattr(it_mod, 'CG_CHUNK_ITERS', 10)
    monkeypatch.setattr(it_mod, 'CG_STEPS_HIST_LEN', 10)
    monkeypatch.setattr(it_mod, 'RESEED_STAGNATION_ITERS', 0)

    trainer = GDMLTrain()
    np.random.seed(47)
    task = trainer.create_task(
        ds, 30, ds, 8, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    from sgdml_tpu.ops import descriptor as desc_ops
    import jax.numpy as jnp

    n_train, n_atoms = task['R_train'].shape[:2]
    R = task['R_train'].reshape(n_train, -1)
    R_desc, R_d_desc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(desc_ops.descriptor_dim(n_atoms))[None, :]
    y = task['F_train'].ravel()
    y_std = float(np.std(y))

    # factor_mode='ozaki' puts the matvec on the first ladder rung even
    # on the CPU test backend.
    solver = it_mod.Iterative(trainer, factor_mode='ozaki')
    with caplog.at_level(logging.INFO, logger='sgdml_tpu.solvers.iterative'):
        out = solver.solve(
            task, np.asarray(R_desc), np.asarray(R_d_desc), dperms,
            y / y_std, y_std, max_seconds=300.0,
        )
    alphas, tol, num_iters, resid, _, _, is_conv = out
    assert any('escalating' in r.message for r in caplog.records)
    assert is_conv
    # Verify true convergence with an independent exact matvec.
    perms_key = (
        np.ascontiguousarray(dperms.astype(np.int64)).tobytes(), dperms.shape
    )
    b = jnp.asarray(y / y_std)
    r_true = b - it_mod._matvec_A(
        jnp.asarray(-alphas), R_desc, R_d_desc, R_desc, R_d_desc,
        float(task['sig']), float(task['lam']), n_atoms=n_atoms,
        desc_perms_key=perms_key, use_E_cstr=False,
    )
    true_resid = float(np.linalg.norm(np.asarray(r_true)))
    assert true_resid <= 1.05 * tol * float(np.linalg.norm(y / y_std))


def test_cg_oscillation_keeps_krylov_space(ds, monkeypatch, caplog):
    """While the BEST residual keeps improving, effectiveness-monitor
    stalls (normal residual-norm oscillation) must NOT re-seed a budgeted
    cap-bounded solve — re-seeding discards the Krylov space exactly when
    it is resolving the hard directions (measured at MD22 M=3000: re-seeds
    every ~100 iters pinned the best residual at 12 where uninterrupted
    CG kept moving)."""
    import logging

    from sgdml_tpu.solvers import iterative as it_mod

    monkeypatch.setattr(it_mod, 'CG_STEPS_HIST_LEN', 4)
    monkeypatch.setattr(it_mod, 'EFF_RESTART_THRESH', 100)  # stall always
    monkeypatch.setattr(it_mod, 'CG_CHUNK_ITERS', 5)
    # Default RESEED_STAGNATION_ITERS (500) is far beyond what this tiny
    # budget reaches while the solve keeps improving.

    trainer = GDMLTrain(max_memory=0.02)
    np.random.seed(46)
    task = trainer.create_task(
        ds, 24, ds, 8, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    from sgdml_tpu.ops import descriptor as desc_ops
    import jax.numpy as jnp

    n_train, n_atoms = task['R_train'].shape[:2]
    R = task['R_train'].reshape(n_train, -1)
    R_desc, R_d_desc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(desc_ops.descriptor_dim(n_atoms))[None, :]
    y = task['F_train'].ravel()
    y_std = float(np.std(y))

    solver = it_mod.Iterative(trainer, max_memory=0.02)
    with caplog.at_level(logging.INFO, logger='sgdml_tpu.solvers.iterative'):
        out = solver.solve(
            task, np.asarray(R_desc), np.asarray(R_d_desc), dperms,
            y / y_std, y_std, tol=0.0, max_seconds=6.0,
        )
    assert np.isfinite(out[0]).all()
    # Every chunk reported a stall, yet no re-seed fired: the Krylov
    # space survived until the wall budget ended the solve.
    assert not any('memory cap' in r.message for r in caplog.records)
    assert any('budget' in r.message for r in caplog.records)


def test_cg_solver_randomness_is_seeded(ds):
    """Two identical solve() calls must produce identical inducing sets
    and iteration traces WITHOUT any global seeding — the solver derives
    its generator from the task's training-split fingerprint (the
    reference draws inducing points from the global numpy stream, making
    solve trajectories irreproducible; sgdml/solvers/iterative.py:401)."""
    import jax.numpy as jnp

    from sgdml_tpu.ops import descriptor as desc_ops
    from sgdml_tpu.solvers.iterative import Iterative

    trainer = GDMLTrain()
    np.random.seed(61)
    task = trainer.create_task(
        ds, 40, ds, 10, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    n_train, n_atoms = task['R_train'].shape[:2]
    R = task['R_train'].reshape(n_train, -1)
    R_desc, R_d_desc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(desc_ops.descriptor_dim(n_atoms))[None, :]
    y = task['F_train'].ravel()
    y_std = float(np.std(y))

    outs = []
    for scramble in (123, 99999):
        # Scramble the GLOBAL stream differently before each call: the
        # solver must not consult it. max_memory caps k below n_train so
        # the leverage-score sampling is a genuine random draw.
        np.random.seed(scramble)
        solver = Iterative(trainer, max_memory=0.01)
        outs.append(
            solver.solve(
                task, np.asarray(R_desc), np.asarray(R_d_desc), dperms,
                y / y_std, y_std,
            )
        )
    (a1, _, it1, _, _, idx1, _), (a2, _, it2, _, _, idx2, _) = outs
    np.testing.assert_array_equal(idx1, idx2)
    assert it1 == it2
    np.testing.assert_array_equal(a1, a2)
    # An explicit seed overrides the derived one (different inducing set).
    np.random.seed(123)
    out3 = Iterative(trainer, max_memory=0.01, seed=7).solve(
        task, np.asarray(R_desc), np.asarray(R_d_desc), dperms,
        y / y_std, y_std,
    )
    assert not np.array_equal(out3[5], idx1)


def test_cg_near_duplicate_geometries_still_returns(ds):
    """Near-duplicate training geometries (ill-conditioned kernel) must not
    hang or crash the solver; it returns a finite solution."""
    trainer = GDMLTrain()
    np.random.seed(43)
    task = trainer.create_task(
        ds, 20, ds, 8, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    # Make half the training set near-copies of the other half.
    R = np.asarray(task['R_train'])
    R[10:] = R[:10] + 1e-7 * np.random.default_rng(0).normal(size=R[:10].shape)
    task['R_train'] = R
    F = np.asarray(task['F_train'])
    F[10:] = F[:10]
    task['F_train'] = F

    model = trainer.train(task, solver='cg')
    assert np.isfinite(model['alphas_F']).all()


def test_column_assembly_with_E_rows(ds):
    """K[:, force cols] with energy rows appended matches the full
    E-constrained assembly."""
    import jax.numpy as jnp

    from sgdml_tpu.ops import descriptor as desc_ops, kernel as ker
    from sgdml_tpu.train import desc_perm_table

    n_atoms = 6
    R = ds['R'][:8].reshape(8, -1)
    X, Jc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = desc_perm_table(np.arange(n_atoms)[None])
    sig = 6.0
    K = np.asarray(
        ker.assemble_kernel(X, Jc, dperms, sig, n_atoms, use_E_cstr=True)
    )
    cols = np.array([0, 17, 55, 100, 143])
    K_cols = np.asarray(
        ker.assemble_kernel_columns(
            X, Jc, dperms, sig, n_atoms, cols, use_E_cstr=True
        )
    )
    np.testing.assert_allclose(K_cols, K[:, cols], rtol=1e-9, atol=1e-12)


def test_cg_with_energy_constraints(ds):
    """Iterative solve with use_E_cstr matches the analytic E-constrained
    solution's predictions."""
    from sgdml_tpu.predict import GDMLPredict
    from sgdml_tpu.train import GDMLTrain

    trainer = GDMLTrain()
    np.random.seed(31)
    task = trainer.create_task(
        ds, 40, ds, 10, sig=8.0, lam=1e-10, use_sym=False, use_E=True,
        use_E_cstr=True,
    )
    m_a = trainer.train(dict(task), solver='analytic')
    np.random.seed(32)
    m_c = trainer.train(dict(task), solver='cg')
    assert 'alphas_E' in m_c

    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:30]
    R_test = ds['R'][ti].reshape(len(ti), -1)
    Ea, Fa = GDMLPredict(m_a).predict(R_test)
    Ec, Fc = GDMLPredict(m_c).predict(R_test)
    assert np.abs(Fc - Fa).mean() / np.abs(Fa).mean() < 1e-2
    assert np.abs(Ec - Ea).mean() < 5e-2


def test_resume_roundtrips_through_npz(ds, models, tmp_path):
    """An (unconverged) checkpoint written with np.savez_compressed and
    reloaded must rebuild a resumable task — the exact path a multi-hour
    CG run takes across process restarts (bench_large.py SGDML_BENCH_CKPT).
    np.load wraps scalars/None/dicts in 0-d object arrays; the round trip
    must survive that."""
    task, _, m_cg = models
    # Simulate an unconverged checkpoint: mid-solve alphas + CG bookkeeping.
    model = dict(m_cg)
    model['solver_iters'] = 7
    model['solver_resid'] = 123.0
    model['solver_mv_mm'] = 'ozaki8'  # persisted precision-ladder rung
    path = tmp_path / 'ckpt.npz'
    np.savez_compressed(path, **model)

    loaded = dict(np.load(path, allow_pickle=True))
    trainer = GDMLTrain()
    resumed = trainer.create_task_from_model(loaded, ds)
    assert 'alphas0_F' in resumed
    assert int(resumed['solver_iters']) == 7
    assert str(resumed['solver_mv_mm']) == 'ozaki8'
    np.random.seed(24)
    m2 = trainer.train(resumed, solver='cg')
    assert m2['solver_resid'] <= m2['solver_tol'] * m2['norm_y_train']


@pytest.mark.parametrize('scale', [1.1, 0.5])
def test_cg_residual_replacement_recovers_from_drift(
    ds, monkeypatch, caplog, scale
):
    """Residual replacement re-anchors a drifting recursive residual at the
    true one (b - Ax): upward drift (scale 1.1) must not trip the stall
    detector (the round-3 MD22 M=3000 failure mode), downward drift
    (scale 0.5) must not declare false convergence. Both runs must reach
    TRUE convergence, verified with an independent exact matvec."""
    import logging

    import jax.numpy as jnp

    from sgdml_tpu.ops import descriptor as desc_ops
    from sgdml_tpu.solvers import iterative as it_mod

    orig_jit = it_mod._pcg_chunk_jit

    def drifting(pin_stack):
        f = orig_jit(pin_stack)

        def call(state, Fp, *a, **k):
            x, r, z, p, rz, it, hist, n_bad = f(state, Fp, *a, **k)
            # Corrupt the recursive residual AND its history between
            # chunks — the host loop must detect the drift against the
            # true residual and re-anchor.
            return (x, r * scale, z, p, rz, it, hist * scale, n_bad)

        return call

    monkeypatch.setattr(it_mod, '_pcg_chunk_jit', drifting)
    monkeypatch.setattr(it_mod, 'CG_CHUNK_ITERS', 10)

    trainer = GDMLTrain()
    np.random.seed(51)
    task = trainer.create_task(
        ds, 30, ds, 8, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    n_train, n_atoms = task['R_train'].shape[:2]
    R = task['R_train'].reshape(n_train, -1)
    R_desc, R_d_desc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(desc_ops.descriptor_dim(n_atoms))[None, :]
    y = task['F_train'].ravel()
    y_std = float(np.std(y))

    solver = it_mod.Iterative(trainer)
    with caplog.at_level(logging.INFO, logger='sgdml_tpu.solvers.iterative'):
        alphas, tol, num_iters, resid, _, _, is_conv = solver.solve(
            task, np.asarray(R_desc), np.asarray(R_d_desc), dperms,
            y / y_std, y_std,
        )
    assert is_conv
    assert any('residual replacement' in r.message for r in caplog.records)
    assert not any('stalled' in r.message for r in caplog.records)

    # Independent ground truth: the returned resid must be the TRUE
    # residual of the returned solution, and truly below tolerance.
    perms_key = (
        np.ascontiguousarray(dperms.astype(np.int64)).tobytes(), dperms.shape
    )
    b = jnp.asarray(y / y_std)
    r_true = b - it_mod._matvec_A(
        jnp.asarray(-alphas), R_desc, R_d_desc, R_desc, R_d_desc,
        float(task['sig']), float(task['lam']), n_atoms=n_atoms,
        desc_perms_key=perms_key, use_E_cstr=False,
    )
    true_resid = float(np.linalg.norm(np.asarray(r_true)))
    b_norm = float(np.linalg.norm(y / y_std))
    assert true_resid <= 1.05 * tol * b_norm, (true_resid, tol * b_norm)
    assert abs(true_resid - resid) <= 0.05 * max(true_resid, 1e-12)


def test_cg_ozaki_factor_matches_f64(ds):
    """factor_mode='ozaki' (int8 slice-stack Woodbury factor, the TPU
    default) must converge to the same predictions as the dense-f64
    factor — the slice stack carries 48 bits below each chunk scale,
    pair-grade for the cancellation-sensitive correction."""
    from sgdml_tpu.solvers.iterative import Iterative, _factor_ncols

    trainer = GDMLTrain()
    np.random.seed(41)
    task = trainer.create_task(
        ds, 50, ds, 20, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    from sgdml_tpu.ops.descriptor import descriptor_batch
    import jax.numpy as jnp

    n_atoms = ds['R'].shape[1]
    R = task['R_train'].reshape(50, -1)
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]
    y = task['F_train'].reshape(-1) / np.std(task['F_train'])

    results = {}
    for mode, ns in (('f64', 8), ('ozaki', 8), ('ozaki6', 6)):
        np.random.seed(42)
        solver = Iterative(
            trainer, max_memory=12,
            factor_mode='ozaki' if mode.startswith('ozaki') else mode,
            factor_slices=ns,
        )
        alphas, tol, iters, resid, rmse, idxs, is_conv = solver.solve(
            task, np.asarray(X), np.asarray(Jc), dperms, y, 1.0
        )
        assert is_conv, mode
        results[mode] = alphas

    denom = np.linalg.norm(results['f64'])
    # Both slice counts converged to tol=1e-4 along slightly different
    # numerical paths; agreement at the CG-tolerance level. (6 slices =
    # the renormalized capacity-fallback stack, 7 B/elem.)
    for mode in ('ozaki', 'ozaki6'):
        rel = np.linalg.norm(results[mode] - results['f64']) / denom
        assert rel < 1e-2, (mode, rel)


def test_auto_factor_slices_picks_largest_k(monkeypatch):
    """The default ('auto') slice count must be the one whose memory
    budget affords the LARGEST inducing-point cap — the round-4 lesson
    (BENCH_NOTES r4: fresh 8-slice k=11 at MD22 M=3000 extrapolated to
    ~76k CG iterations while 6-slice k=15 converged in 14k) encoded as
    what `sgdml-tpu train` actually runs, with no env vars."""
    from sgdml_tpu.solvers.iterative import Iterative

    monkeypatch.delenv('SGDML_FACTOR_SLICES', raising=False)
    it = Iterative(max_memory=15.5)
    assert it.factor_slices == 'auto'

    # MD22 AT-AT M=3000 on a 16 GB chip: 6 slices afford k=15 where 8
    # afford only 11 — auto must pick the measured-converging config.
    ns, k = it.resolve_factor_slices(3000, 60)
    assert (ns, k) == (6, 15)
    assert Iterative.max_n_inducing_pts(
        3000, 60, 15.5 * 1024**3, factor_bytes=9.0, streamed=True
    ) == 11

    # k-tie (both cap at n_train): prefer the clean 8-slice spectrum.
    ns_s, k_s = it.resolve_factor_slices(24, 5)
    assert (ns_s, k_s) == (8, 24)

    # Env override still wins over auto.
    monkeypatch.setenv('SGDML_FACTOR_SLICES', '6')
    assert Iterative(max_memory=15.5).factor_slices == 6
    # Explicit kwarg wins over everything.
    assert Iterative(max_memory=15.5, factor_slices=8).factor_slices == 8


def test_auto_factor_slices_resolved_in_solve(ds, monkeypatch):
    """A fresh solve with the 'auto' default must resolve the slice
    count through `resolve_factor_slices` (tie at small scale -> 8) and
    converge exactly like the explicit-8 configuration."""
    from sgdml_tpu.solvers.iterative import Iterative
    from sgdml_tpu.ops.descriptor import descriptor_batch
    import jax.numpy as jnp

    monkeypatch.delenv('SGDML_FACTOR_SLICES', raising=False)
    trainer = GDMLTrain()
    np.random.seed(43)
    task = trainer.create_task(
        ds, 40, ds, 20, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    n_atoms = ds['R'].shape[1]
    R = task['R_train'].reshape(40, -1)
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]
    y = task['F_train'].reshape(-1) / np.std(task['F_train'])

    solver = Iterative(trainer, max_memory=12, factor_mode='ozaki')
    assert solver.factor_slices == 'auto'
    out = solver.solve(task, np.asarray(X), np.asarray(Jc), dperms, y, 1.0)
    assert out[6]  # converged
    assert solver._ns() == 8  # tie resolved to the 8-slice default


def test_cg_e_cstr_checkpoint_and_resume(ds, monkeypatch):
    """E-constrained checkpoints must split the extended unknown vector
    into alphas_F / alphas_E before create_model (passing it whole
    crashed the solve's first periodic checkpoint: the (M, 3N) reshape
    of an M*(3N+1)-length vector), and an E-constrained resume must
    rebuild x0 from BOTH stored blocks (the force block alone is a
    shape mismatch against the extended RHS)."""
    from sgdml_tpu.solvers import iterative as it_mod

    monkeypatch.setattr(it_mod, 'CHECKPOINT_INTERVAL_S', 0.0)
    monkeypatch.setattr(it_mod, 'CG_CHUNK_ITERS', 5)

    # Small budget -> weak preconditioner, so the solve spans several
    # chunks and the periodic checkpoint genuinely fires mid-solve.
    trainer = GDMLTrain(max_memory=0.005)
    np.random.seed(33)
    task = trainer.create_task(
        ds, 40, ds, 10, sig=8.0, lam=1e-10, use_sym=False, use_E=True,
        use_E_cstr=True,
    )
    saved = []
    m = trainer.train(dict(task), solver='cg',
                      save_progr_callback=saved.append)
    assert saved, 'periodic checkpoint never fired'
    n_train, n_atoms = task['R_train'].shape[:2]
    ck = saved[-1]
    assert ck['alphas_F'].shape == (n_train * 3 * n_atoms,)
    assert ck['alphas_E'].shape == (n_train,)

    # Resume: warm start from both blocks, converging near-immediately.
    resumed = trainer.create_task_from_model(m, ds)
    assert 'alphas0_F' in resumed and 'alphas0_E' in resumed
    m2 = trainer.train(resumed, solver='cg')
    assert m2['solver_iters'] - m['solver_iters'] <= 10
    assert m2['solver_resid'] <= m2['solver_tol'] * m2['norm_y_train']


def test_cg_warm_start_size_mismatch_falls_back(ds, caplog):
    """Stale warm-start coefficients (wrong length for the system) must
    be ignored with a warning, not crash the solve."""
    import logging

    trainer = GDMLTrain()
    np.random.seed(34)
    task = trainer.create_task(
        ds, 30, ds, 10, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    task['alphas0_F'] = np.zeros(17)  # wrong length
    with caplog.at_level(logging.WARNING):
        m = trainer.train(task, solver='cg')
    assert m['solver_resid'] <= m['solver_tol'] * m['norm_y_train']
    assert any('warm-start' in r.message.lower() for r in caplog.records)
