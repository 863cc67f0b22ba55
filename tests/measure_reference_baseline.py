"""Measure the reference implementation's performance on this machine.

Produces BENCH_BASELINE.json at the repo root with the reference's
training wall-clock and bulk-inference throughput on the synthetic
ethanol-sized benchmark (N=9, M=200 train, 10k query geometries) — the
numbers bench.py compares against (BASELINE.md configs 1 and 2).

Run manually:  python tests/measure_reference_baseline.py
"""

import json
import os
import pathlib
import sys
import timeit

import numpy as np

REF = os.environ.get('SGDML_REFERENCE', '/root/reference')
ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, REF)
sys.path.insert(0, str(ROOT))


def main():
    from sgdml_tpu.datasets.synthetic import generate_md_dataset

    import sgdml.train as ref_train
    from sgdml.predict import GDMLPredict

    n_atoms, m_train, n_bulk = 9, 200, 10000

    print('generating dataset...', flush=True)
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=12000, seed=0)

    trainer = ref_train.GDMLTrain()

    np.random.seed(1)
    t0 = timeit.default_timer()
    task = trainer.create_task(
        ds, m_train, ds, 500, sig=10.0, lam=1e-10, use_sym=False, use_E=True
    )
    t_task = timeit.default_timer() - t0
    print('task created in %.1f s' % t_task, flush=True)

    t0 = timeit.default_timer()
    model = trainer.train(task)
    t_train = timeit.default_timer() - t0
    print('trained in %.1f s' % t_train, flush=True)

    # Test-set force MAE of the reference model (parity target).
    pred = GDMLPredict(model)
    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:1000]
    R_test = ds['R'][ti].reshape(len(ti), -1)
    e, f = pred.predict(R_test)
    f_mae = float(np.abs(f - ds['F'][ti].reshape(len(ti), -1)).mean())
    e_mae = float(np.abs(e - ds['E'][ti]).mean())
    print('force MAE %.5f, energy MAE %.5f' % (f_mae, e_mae), flush=True)

    # Bulk-inference throughput after the reference's own auto-tuner.
    R_bulk = ds['R'][:n_bulk].reshape(n_bulk, -1)
    print('running prepare_parallel...', flush=True)
    t0 = timeit.default_timer()
    gps_tuned = pred.prepare_parallel(n_bulk=n_bulk, return_is_from_cache=False)
    t_tune = timeit.default_timer() - t0
    print('auto-tuner: %.1f s -> %s gps' % (t_tune, gps_tuned), flush=True)

    t0 = timeit.default_timer()
    e, f = pred.predict(R_bulk)
    t_pred = timeit.default_timer() - t0
    gps = n_bulk / t_pred
    print('bulk predict: %.2f s -> %.0f geoms/sec' % (t_pred, gps), flush=True)

    out = {
        'system': 'synthetic ethanol-sized (N=9), Morse-Langevin trajectory',
        'reference_train_s': t_train,
        'reference_task_s': t_task,
        'reference_pred_geoms_per_sec': gps,
        'reference_force_mae': f_mae,
        'reference_energy_mae': e_mae,
        'n_train': m_train,
        'n_bulk': n_bulk,
        'sig': 10.0,
        'host_cpus': os.cpu_count(),
    }
    with open(ROOT / 'BENCH_BASELINE.json', 'w') as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
