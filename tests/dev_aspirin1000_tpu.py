"""Dev driver: aspirin-sized M=1000 ANALYTIC training end-to-end on one
TPU chip through the product path (GDMLTrain -> f32 tree-PCG analytic ->
GDMLPredict held-out force MAE).

This is the config the dense-f64 analytic solver can never reach on a
16 GB chip (K alone is 31.7 GB f64); the reference handles it on a big-RAM
host at O(hours). Run serialized with all other TPU work:

    PYTHONPATH=/root/repo:$PYTHONPATH timeout 5400 \
        python tests/dev_aspirin1000_tpu.py [M]
"""
import sys
import timeit

import jax

jax.config.update('jax_enable_x64', True)

import logging
logging.basicConfig(level=logging.INFO, format='[%(levelname)s] %(message)s')

import numpy as np

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.predict import GDMLPredict
from sgdml_tpu.train import GDMLTrain


def main(m_train=1000, n_atoms=21, sig=20.0):
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m_train + 600, seed=10)
    trainer = GDMLTrain(max_memory=11)
    np.random.seed(1)
    task = trainer.create_task(
        ds, m_train, ds, 200, sig=sig, lam=1e-10, use_sym=False, use_E=True
    )
    t0 = timeit.default_timer()
    model = trainer.train(task, solver='analytic')
    t_train = timeit.default_timer() - t0
    print(f'TRAIN (analytic tree-PCG) M={m_train}: {t_train:.1f} s wall',
          flush=True)

    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:400]
    pred = GDMLPredict(model, batch_size=200)
    _, F = pred.predict(ds['R'][ti].reshape(len(ti), -1))
    f_ref = ds['F'][ti].reshape(len(ti), -1)
    mae = float(np.abs(F - f_ref).mean())
    scale = float(np.abs(f_ref).mean())
    print(f'held-out force MAE: {mae:.6f} (force scale {scale:.4f}, '
          f'rel {mae/scale:.2e})', flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
