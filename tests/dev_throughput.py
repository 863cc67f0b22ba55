"""Dev utility: bulk-inference scaling — one big launch vs async chain,
f64 vs f32 transfer dtypes. Identifies the throughput bound."""

import pathlib
import sys
import timeit

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

import sgdml_tpu  # noqa: F401
from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.predict import GDMLPredict
from sgdml_tpu.train import GDMLTrain


def main():
    ds = generate_md_dataset(n_atoms=9, n_frames=22000, seed=0)
    trainer = GDMLTrain()
    np.random.seed(1)
    task = trainer.create_task(
        ds, 200, ds, 500, sig=10.0, lam=1e-10, use_sym=False, use_E=True
    )
    model = trainer.train(task, solver='analytic')

    for n_bulk, bucket in [(10000, 10000), (20000, 10000), (20000, 20000)]:
        R = ds['R'][:n_bulk].reshape(n_bulk, -1)
        pred = GDMLPredict(model, batch_size=bucket)
        pred.predict(R[:bucket])  # warm
        dt = float('inf')
        for _ in range(3):
            t0 = timeit.default_timer()
            pred.predict(R)
            dt = min(dt, timeit.default_timer() - t0)
        print(
            'n_bulk=%5d bucket=%5d: %7.0f geoms/s (%.3fs)'
            % (n_bulk, bucket, n_bulk / dt, dt),
            flush=True,
        )


if __name__ == '__main__':
    main()
