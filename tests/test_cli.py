"""End-to-end CLI pipeline test: `all` on a synthetic dataset, plus
show/validate/select round trips."""

import os

import numpy as np
import pytest

from sgdml_tpu import cli
from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.utils import io


@pytest.fixture(scope='module')
def dataset_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('data')
    ds = generate_md_dataset(n_atoms=5, n_frames=300, seed=6)
    path = str(tmp / 'synth5.npz')
    io.save_dict(path, ds)
    return path


def test_all_pipeline(dataset_file, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    np.random.seed(1)
    cli.main(
        [
            'all',
            dataset_file,
            '40',
            '20',
            '100',
            '-s',
            '5,10',
            '--gdml',
            '--solver',
            'analytic',
        ]
    )
    out = capsys.readouterr().out
    assert 'Model saved to' in out

    # A final model file exists and tests successfully.
    models = [f for f in os.listdir('.') if f.endswith('.npz')]
    assert models, 'no final model written'
    final = [f for f in models if f.startswith('synth5')]
    assert final, models
    model = io.load_dict(final[0])
    assert io.is_model(model)
    # Test errors were recorded into the model file.
    f_err = model['f_err']
    if isinstance(f_err, np.ndarray):
        f_err = f_err.item()
    assert np.isfinite(f_err['rmse'])
    # Accuracy: the synthetic system must be learnable.
    ds = io.load_dict(dataset_file)
    f_scale = np.abs(ds['F']).mean()
    assert f_err['mae'] < 0.1 * f_scale


def test_show(dataset_file, capsys):
    cli.main(['show', dataset_file])
    out = capsys.readouterr().out
    assert 'type: dataset' in out


def test_train_early_stopping(dataset_file, tmp_path, monkeypatch, capsys):
    """Sigma search stops once validation error rises."""
    monkeypatch.chdir(tmp_path)
    np.random.seed(2)
    task_dir = cli.create(
        cli.argparse.Namespace(
            dataset=dataset_file,
            n_train=30,
            n_valid=10,
            sig=[2, 5, 10, 50],
            lam=1e-10,
            gdml=True,
            no_E=False,
            E_cstr=False,
            overwrite=True,
            task_dir='tasks_es',
            max_memory=None,
            solver='analytic',
        )
    )
    paths = cli.train(
        cli.argparse.Namespace(
            task=task_dir,
            valid_dataset=dataset_file,
            overwrite=False,
            max_memory=None,
            solver='analytic',
        )
    )
    assert len(paths) >= 1
