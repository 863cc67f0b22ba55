"""Auto-tuner + benchmark cache tests."""

import numpy as np
import pytest

from sgdml_tpu import tune
from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.predict import GDMLPredict
from sgdml_tpu.train import GDMLTrain


@pytest.fixture(scope='module')
def model():
    ds = generate_md_dataset(n_atoms=4, n_frames=120, seed=14)
    trainer = GDMLTrain()
    np.random.seed(14)
    task = trainer.create_task(ds, 20, ds, 10, sig=5.0, use_sym=False)
    return trainer.train(task, solver='analytic')


def test_prepare_parallel_tunes_and_caches(model, tmp_path, monkeypatch):
    monkeypatch.setenv('SGDML_TPU_BMARK_CACHE', str(tmp_path / 'cache.json'))
    pred = GDMLPredict(model)
    gps = pred.prepare_parallel(n_bulk=128, n_reps=1)
    assert gps > 0
    chosen = pred.batch_size
    assert chosen in tune.BUCKET_LADDER

    # Second call must hit the cache (and keep the same choice).
    pred2 = GDMLPredict(model)
    gps2 = pred2.prepare_parallel(n_bulk=128)
    assert pred2.batch_size == chosen
    assert gps2 == pytest.approx(gps)

    assert tune.reset_cache()
    assert not tune.reset_cache()  # second purge: nothing left
