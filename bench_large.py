"""Large-system benchmarks (BASELINE.md configs 3-5 analogs).

Not part of the driver's one-line bench; run manually:

    python bench_large.py [aspirin|atat|sym|md]

* ``aspirin``: aspirin-sized (N=21) M=1000 training with the iterative
  Nystrom-pCG solver + held-out force MAE.
* ``atat``:    AT-AT-sized (N=60) M=600 iterative training (scaled to
  single-chip HBM; the real MD22 config is M=3000 on a pod slice).
* ``sym``:     symmetry discovery + sGDML-vs-GDML force-MAE comparison.
* ``md``:      on-device NVE molecular dynamics throughput + energy drift.
"""

import json
import logging
import sys
import timeit

import numpy as np

logging.basicConfig(level=logging.INFO, format='[%(levelname)s] %(message)s')


def _train(ds, m_train, sig, solver, lam=1e-10, use_sym=False,
           max_seconds=None, ckpt=None):
    import os

    from sgdml_tpu.train import GDMLTrain

    # The chip has 15.7 GiB usable (BENCH_NOTES.md); the framework's
    # conservative 12 GiB default would route M=1000-class analytic
    # training to the f32-grid path instead of the pair path.
    trainer = GDMLTrain(max_memory=15.5)
    np.random.seed(1)
    if ckpt and os.path.isfile(ckpt):
        # Resume a multi-hour CG across process/VM restarts: rebuild the
        # task from the periodically-checkpointed unconverged model
        # (same split, warm-started alphas — train.py
        # create_task_from_model, reference sgdml/train.py:649-725).
        model0 = dict(np.load(ckpt, allow_pickle=True))
        task = trainer.create_task_from_model(model0, ds)
        logging.info(
            'Warm-starting from %s (%s CG iterations so far).',
            ckpt, model0.get('solver_iters', '?'),
        )
    else:
        task = trainer.create_task(
            ds, m_train, ds, 200, sig=sig, lam=lam, use_sym=use_sym,
            use_E=True,
        )
    save_cb = None
    if ckpt:
        def save_cb(model):
            # Atomic-rename save. Retry once: an external repo cleaner
            # can race the untracked tmp away between write and rename
            # (measured: one such race at 00:34 killed a 4-hour run
            # before the solver made checkpoint failures non-fatal).
            tmp = ckpt + '.tmp.npz'
            for attempt in (0, 1):
                try:
                    np.savez_compressed(tmp, **model)
                    os.replace(tmp, ckpt)
                    return
                except FileNotFoundError:
                    if attempt:
                        raise
    # Warm the backend before the timer: the first device touch pays the
    # per-process TPU claim through the axon tunnel (measured 30-140 s
    # depending on tunnel health — BENCH_NOTES round 3), which would
    # otherwise be misattributed to whatever phase runs first.
    import jax.numpy as jnp

    np.asarray(jnp.zeros(8) + 1.0)
    t0 = timeit.default_timer()
    model = trainer.train(
        task, solver=solver, solver_max_seconds=max_seconds,
        save_progr_callback=save_cb,
    )
    t_train = timeit.default_timer() - t0
    if ckpt:
        save_cb(model)  # final state (converged or budget-ended)
    return task, model, t_train


def _force_mae(ds, task, model, n_test=500):
    from sgdml_tpu.predict import GDMLPredict

    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:n_test]
    pred = GDMLPredict(model, batch_size=min(len(ti), 512))
    _, F = pred.predict(ds['R'][ti].reshape(len(ti), -1))
    f_ref = ds['F'][ti].reshape(len(ti), -1)
    return float(np.abs(F - f_ref).mean()), float(np.abs(f_ref).mean())


def bench_aspirin():
    from sgdml_tpu.datasets.synthetic import generate_md_dataset

    ds = generate_md_dataset(n_atoms=21, n_frames=2200, seed=10)
    task, model, t_train = _train(
        ds, 1000, sig=15.0, solver='cg', lam=1e-8, max_seconds=1200
    )
    mae, scale = _force_mae(ds, task, model)
    out = {
        'config': 'aspirin-sized N=21 M=1000 iterative (Nystrom-pCG)',
        'train_s': round(t_train, 2),
        'cg_iters': int(model.get('solver_iters', -1)),
        'converged': bool(
            model['solver_resid'] <= model['solver_tol'] * model['norm_y_train']
        ),
        'force_mae': round(mae, 5),
        'force_scale': round(scale, 4),
    }
    print(json.dumps(out))


def bench_atat():
    from sgdml_tpu.datasets.synthetic import generate_md_dataset

    ds = generate_md_dataset(n_atoms=60, n_frames=1400, seed=11)
    task, model, t_train = _train(
        ds, 600, sig=25.0, solver='cg', max_seconds=1200
    )
    mae, scale = _force_mae(ds, task, model, n_test=300)
    out = {
        'config': 'AT-AT-sized N=60 M=600 iterative (Nystrom-pCG)',
        'train_s': round(t_train, 2),
        'cg_iters': int(model.get('solver_iters', -1)),
        'converged': bool(
            model['solver_resid'] <= model['solver_tol'] * model['norm_y_train']
        ),
        'force_mae': round(mae, 5),
        'force_scale': round(scale, 4),
    }
    print(json.dumps(out))


def bench_atat3000():
    """MD22 AT-AT scale: N=60, M=3000 iterative training end-to-end
    (reference: sgdml/solvers/iterative.py:473-825; README.md:129-132).

    Overridables (environment): SGDML_BENCH_M (default 3000),
    SGDML_BENCH_MAXS (CG wall-clock budget, default 1800 s)."""
    import os

    from sgdml_tpu.datasets.synthetic import generate_md_dataset

    m_train = int(os.environ.get('SGDML_BENCH_M', 3000))
    max_seconds = float(os.environ.get('SGDML_BENCH_MAXS', 1800))
    # SGDML_BENCH_CKPT=<path.npz>: checkpoint the unconverged model every
    # ~2 min and warm-start from it on relaunch — lets a multi-hour CG
    # span process/VM restarts (pick a path that survives them).
    ckpt = os.environ.get('SGDML_BENCH_CKPT') or None
    ds = generate_md_dataset(n_atoms=60, n_frames=m_train + 600, seed=11)
    task, model, t_train = _train(
        ds, m_train, sig=25.0, solver='cg', max_seconds=max_seconds,
        ckpt=ckpt,
    )
    mae, scale = _force_mae(ds, task, model, n_test=300)
    out = {
        'config': 'MD22 AT-AT-sized N=60 M=%d iterative (Nystrom-pCG)'
                  % m_train,
        'train_s': round(t_train, 2),
        'cg_iters': int(model.get('solver_iters', -1)),
        'converged': bool(
            model['solver_resid'] <= model['solver_tol'] * model['norm_y_train']
        ),
        'force_mae': round(mae, 5),
        'force_scale': round(scale, 4),
    }
    print(json.dumps(out))


def bench_aspirin_analytic():
    """Aspirin-sized M=1000 ANALYTIC training (f32 block-grid + refinement
    CG) — the config dense f64 can never reach on a 16 GB chip."""
    from sgdml_tpu.datasets.synthetic import generate_md_dataset

    ds = generate_md_dataset(n_atoms=21, n_frames=1600, seed=10)
    task, model, t_train = _train(ds, 1000, sig=20.0, solver='analytic')
    mae, scale = _force_mae(ds, task, model)
    out = {
        'config': 'aspirin-sized N=21 M=1000 analytic (pair-precision chol + refine-CG)',
        'train_s': round(t_train, 2),
        'force_mae': round(mae, 5),
        'force_scale': round(scale, 4),
    }
    print(json.dumps(out))


def bench_atat3000_mesh():
    """MD22 AT-AT scale on the 8-device virtual CPU mesh: the inducing-
    point budget scales with the device count (the factor is column-
    sharded and its build runs strip-parallel), so the preconditioner
    that a single 16 GB chip caps at k=4 points reaches k~26 here — the
    TPU-native answer to the reference's 100+ GB-host requirement
    (sgdml/solvers/iterative.py:473-825, README.md:129-132).

    Overridables (environment): SGDML_BENCH_M (default 3000),
    SGDML_BENCH_MAXS (CG wall-clock budget, default 14400 s),
    SGDML_BENCH_PERDEV (per-device GB budget, default 12 — set small to
    demonstrate the capacity contrast at a wall-clock-feasible scale:
    e.g. M=600 PERDEV=1.5 gives k_cap 2 on one device vs 16 on the mesh).
    """
    import os

    import jax

    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.parallel.mesh import default_mesh
    from sgdml_tpu.solvers.iterative import Iterative
    from sgdml_tpu.train import GDMLTrain

    m_train = int(os.environ.get('SGDML_BENCH_M', 3000))
    max_seconds = float(os.environ.get('SGDML_BENCH_MAXS', 14400))
    per_dev_gb = float(os.environ.get('SGDML_BENCH_PERDEV', 12.0))
    ckpt = os.environ.get('SGDML_BENCH_CKPT') or None
    assert jax.devices()[0].platform == 'cpu', 'mesh bench runs on the CPU mesh'
    mesh = default_mesh(8)

    ds = generate_md_dataset(n_atoms=60, n_frames=m_train + 600, seed=11)
    k1 = Iterative.max_n_inducing_pts(m_train, 60, per_dev_gb * 1024**3, 1)
    k8 = Iterative.max_n_inducing_pts(m_train, 60, per_dev_gb * 1024**3, 8)

    trainer = GDMLTrain(max_memory=per_dev_gb, mesh=mesh)
    np.random.seed(1)
    if ckpt and os.path.isfile(ckpt):
        # Same multi-hour-run insurance as the single-chip _train() path:
        # resume the CG from the periodically-checkpointed unconverged
        # model (same split, warm-started alphas).
        model0 = dict(np.load(ckpt, allow_pickle=True))
        task = trainer.create_task_from_model(model0, ds)
        logging.info(
            'Warm-starting from %s (%s CG iterations so far).',
            ckpt, model0.get('solver_iters', '?'),
        )
    else:
        task = trainer.create_task(
            ds, m_train, ds, 200, sig=25.0, lam=1e-10, use_sym=False,
            use_E=True,
        )
    save_cb = None
    if ckpt:
        def save_cb(model):
            tmp = ckpt + '.tmp.npz'
            for attempt in (0, 1):
                try:
                    np.savez_compressed(tmp, **model)
                    os.replace(tmp, ckpt)
                    return
                except FileNotFoundError:
                    if attempt:
                        raise
    t0 = timeit.default_timer()
    model = trainer.train(
        task, solver='cg', solver_max_seconds=max_seconds,
        save_progr_callback=save_cb,
    )
    if save_cb is not None:
        save_cb(model)
    t_train = timeit.default_timer() - t0
    mae, scale = _force_mae(ds, task, model, n_test=300)
    out = {
        'config': 'MD22 AT-AT-sized N=60 M=%d iterative, 8-device mesh '
        '(sharded Nystrom factor)' % m_train,
        'train_s': round(t_train, 2),
        'cg_iters': int(model.get('solver_iters', -1)),
        'k_inducing_pts': int(len(model['inducing_pts_idxs']) // 180),
        'k_cap_single_device': int(k1),
        'k_cap_mesh': int(k8),
        'converged': bool(
            model['solver_resid'] <= model['solver_tol'] * model['norm_y_train']
        ),
        'force_mae': round(mae, 5),
        'force_scale': round(scale, 4),
    }
    print(json.dumps(out))


def bench_mesh_ozaki():
    """Mid-scale END-TO-END mesh-ozaki solve (VERDICT r4 item #3): the
    column-sharded int8 slice-stack factor + int8 CG matvecs, converged
    on the 8-device virtual CPU mesh at a scale meaningfully above the
    m=19 dryrun — so the mesh x int8 capacity table rests on a real
    multi-device convergence, not only unit parity + budget arithmetic.
    (int8 matvecs are EMULATED on CPU — wall time here is not a TPU
    rate; the point is end-to-end correctness of the full sharded
    slice-stack route at scale.)

    Overridables: SGDML_BENCH_N_ATOMS (default 24), SGDML_BENCH_M
    (default 300), SGDML_BENCH_PERDEV (per-device GB, default 2.0).
    The defaults give n = 21,600 unknowns and a k = 34 cap under the
    auto slice-count rule (6 slices; verified against
    ``max_n_inducing_pts`` at 7 B/elem) — k/M = 0.11, so the
    preconditioner is genuinely low-rank and the int8 matvec path
    carries the solve. (At the originally-drafted N=12/M=150 shape a
    2.2 GB budget affords k = M: a full-rank factor that converges in
    a handful of iterations and tests nothing.)

    Sets SGDML_MESH_PT_CH=8 (overridable): XLA's in-process CPU
    communicator hard-aborts collectives whose participants don't all
    join within 40 s, and the 8 virtual devices' pre-psum factor-build
    segments serialize through this host's single core — small streamed
    chunks keep each segment well inside the window. Real-TPU meshes
    don't need the knob.
    """
    import os

    os.environ.setdefault('SGDML_MESH_PT_CH', '8')

    import jax
    import jax.numpy as jnp

    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.ops import descriptor as d_ops
    from sgdml_tpu.parallel.mesh import default_mesh
    from sgdml_tpu.solvers.iterative import Iterative
    from sgdml_tpu.train import GDMLTrain, desc_perm_table

    n_atoms = int(os.environ.get('SGDML_BENCH_N_ATOMS', 24))
    m_train = int(os.environ.get('SGDML_BENCH_M', 300))
    per_dev_gb = float(os.environ.get('SGDML_BENCH_PERDEV', 2.0))
    max_seconds = float(os.environ.get('SGDML_BENCH_MAXS', 7200))
    assert jax.devices()[0].platform == 'cpu'
    mesh = default_mesh(8)

    ds = generate_md_dataset(
        n_atoms=n_atoms, n_frames=m_train + 400, seed=21
    )
    trainer = GDMLTrain(max_memory=per_dev_gb, mesh=mesh)
    np.random.seed(1)
    task = trainer.create_task(
        ds, m_train, ds, 100, sig=12.0, lam=1e-10, use_sym=False,
        use_E=True,
    )
    R = task['R_train'].reshape(m_train, -1)
    X, Jc = d_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = desc_perm_table(task['perms'])
    y = task['F_train'].ravel()
    y_std = float(np.std(y))

    # factor_mode='ozaki' forces the slice-stack route on the CPU mesh
    # (the 'auto' gate picks it only on TPU, where int8 is native).
    solver = Iterative(
        trainer, max_memory=per_dev_gb, mesh=mesh, factor_mode='ozaki'
    )
    t0 = timeit.default_timer()
    alphas, tol, iters, resid, rmse, idxs, is_conv = solver.solve(
        task, np.asarray(X), np.asarray(Jc), dperms, y / y_std, y_std,
        max_seconds=max_seconds,
    )
    t_train = timeit.default_timer() - t0

    model = trainer.create_model(task, 'cg', X, Jc, y_std, alphas)
    model['solver_tol'], model['solver_resid'] = tol, resid
    model['norm_y_train'] = float(np.linalg.norm(y / y_std))
    model['solver_iters'] = iters
    model['inducing_pts_idxs'] = np.asarray(idxs)
    if 'E_train' in task:
        from sgdml_tpu.predict import GDMLPredict

        pred = GDMLPredict(model)
        pred.set_R_desc(X)
        pred.set_R_d_desc(Jc)
        E_pred, _ = pred.predict()
        model['c'] = float(
            np.mean(np.squeeze(task['E_train']) - E_pred)
        )
    mae, scale = _force_mae(ds, task, model, n_test=200)
    out = {
        'config': 'mesh-ozaki end-to-end N=%d M=%d, 8-device mesh '
        '(column-sharded int8 slice-stack factor + int8 CG matvec)'
        % (n_atoms, m_train),
        'train_s': round(t_train, 2),
        'cg_iters': int(iters),
        'k_inducing_pts': int(len(idxs) // (3 * n_atoms)),
        'n_slices': int(solver._ns()),
        'converged': bool(is_conv),
        'force_mae': round(mae, 5),
        'force_scale': round(scale, 4),
    }
    print(json.dumps(out))


def bench_sym():
    from sgdml_tpu.datasets.synthetic import generate_symmetric_md_dataset
    from sgdml_tpu import perm as perm_mod

    ds = generate_symmetric_md_dataset(n_frames=600, seed=0)
    t0 = timeit.default_timer()
    perms = perm_mod.find_perms(ds['R'][:100], ds['z'])
    t_perm = timeit.default_timer() - t0

    maes = {}
    for use_sym in (False, True):
        task, model, t_train = _train(
            ds, 100, sig=6.0, solver='analytic', use_sym=use_sym
        )
        maes[use_sym], scale = _force_mae(ds, task, model, n_test=300)
    out = {
        'config': 'symmetry discovery + sGDML vs GDML (synthetic CH3-CH3)',
        'n_perms_found': int(perms.shape[0]),
        'discovery_s': round(t_perm, 2),
        'force_mae_gdml': round(maes[False], 5),
        'force_mae_sgdml': round(maes[True], 5),
        'force_scale': round(scale, 4),
    }
    print(json.dumps(out))


def bench_md():
    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.md import MDEngine

    ds = generate_md_dataset(n_atoms=9, n_frames=600, seed=0)
    task, model, _ = _train(ds, 200, sig=10.0, solver='analytic')
    engine = MDEngine(model)
    r0 = ds['R'][0]
    v0 = np.zeros_like(r0)
    n_steps = 2000
    engine.run_nve(r0, v0, dt=0.01, n_steps=100, snapshot_every=100)  # warm
    t0 = timeit.default_timer()
    R, V, E_pot, E_kin = engine.run_nve(
        r0, v0, dt=0.01, n_steps=n_steps, snapshot_every=100
    )
    dt = timeit.default_timer() - t0
    E_tot = E_pot + E_kin
    out = {
        'config': 'on-device NVE MD (N=9, trained model)',
        'md_steps_per_sec': round(n_steps / dt, 1),
        'energy_drift': float(np.abs(E_tot - E_tot[0]).max()),
        'kinetic_scale': float(np.abs(E_kin).max()),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    import os

    which = sys.argv[1] if len(sys.argv) > 1 else 'sym'
    if which.endswith('_mesh') or os.environ.get('SGDML_BENCH_CPU'):
        # Force the CPU backend BEFORE jax backend init (the environment's
        # sitecustomize force-registers a TPU plugin that ignores
        # JAX_PLATFORMS, so the config-level override is required too).
        # _mesh modes additionally get an 8-device virtual CPU mesh;
        # SGDML_BENCH_CPU=1 forces CPU for any mode (plumbing smoke tests
        # must not pay — or collide with — the TPU tunnel).
        os.environ['JAX_PLATFORMS'] = 'cpu'
        if which.endswith('_mesh'):
            flags = os.environ.get('XLA_FLAGS', '')
            if '--xla_force_host_platform_device_count' not in flags:
                flags = (
                    flags + ' --xla_force_host_platform_device_count=8'
                )
            # The virtual devices' compute segments serialize through
            # this 1-core host's single Eigen worker, so collective
            # participants can straggle far past the 40 s default before
            # joining; raise the in-process communicator's hard-abort
            # window (an emulation artifact — real TPU collectives ride
            # ICI with per-chip cores).
            if '--xla_cpu_collective_call_terminate_timeout' not in flags:
                flags += (
                    ' --xla_cpu_collective_call_terminate_timeout_seconds'
                    '=3600'
                    ' --xla_cpu_collective_call_warn_stuck_timeout_seconds'
                    '=300'
                )
            os.environ['XLA_FLAGS'] = flags.strip()
        import jax

        jax.config.update('jax_platforms', 'cpu')
    {
        'aspirin': bench_aspirin,
        'aspirin_analytic': bench_aspirin_analytic,
        'atat': bench_atat,
        'atat3000': bench_atat3000,
        'atat3000_mesh': bench_atat3000_mesh,
        'ozaki_mesh': bench_mesh_ozaki,
        'sym': bench_sym,
        'md': bench_md,
    }[which]()
