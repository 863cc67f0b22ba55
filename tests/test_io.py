"""utils/io helpers: naming, hashing, parsing, xyz round trips."""

import numpy as np
import pytest

from sgdml_tpu.utils import io


def test_parse_list_or_range():
    assert io.parse_list_or_range('5') == 5
    assert io.parse_list_or_range('1,2,3') == [1, 2, 3]
    assert io.parse_list_or_range('10:10:40') == [10, 20, 30, 40]
    with pytest.raises(ValueError):
        io.parse_list_or_range('abc')


def test_artifact_naming():
    task = {
        'idxs_train': np.arange(20),
        'perms': np.zeros((3, 5)),
        'sig': 42,
        'dataset_name': np.array('mol'),
        'dataset_theory': np.array('DFT/PBE'),
    }
    assert io.task_file_name(task) == 'task-train20-sym3-sig0042.npz'
    assert io.model_file_name(task) == 'model-train20-sym3-sig0042.npz'
    ext = io.model_file_name(task, is_extended=True)
    assert ext.startswith('mol-') and ext.endswith('-train20-sym3.npz')


def test_dataset_md5_sensitivity():
    ds = {
        'z': np.array([1, 6]),
        'R': np.zeros((3, 2, 3)),
        'F': np.ones((3, 2, 3)),
        'E': np.arange(3.0),
    }
    h1 = io.dataset_md5(ds)
    ds2 = dict(ds)
    ds2['F'] = ds['F'] + 1e-12
    assert io.dataset_md5(ds2) != h1
    # no-E dataset hashes differently
    ds3 = {k: v for k, v in ds.items() if k != 'E'}
    assert io.dataset_md5(ds3) != h1


def test_xyz_roundtrip(tmp_path):
    r = np.random.default_rng(0).normal(size=(4, 3))
    z = np.array([6, 1, 8, 1])
    path = str(tmp_path / 'geom.xyz')
    io.write_xyz(path, r, z, comment='test')
    R, z2 = io.read_xyz(path)
    np.testing.assert_array_equal(z2, z)
    np.testing.assert_allclose(R.reshape(4, 3), r, rtol=1e-12)


def test_lattice_vec_to_par():
    lengths, angles = io.lattice_vec_to_par(np.diag([2.0, 3.0, 4.0]))
    assert lengths == [2.0, 3.0, 4.0]
    assert angles == [90.0, 90.0, 90.0]


def test_validate_dataset_errors():
    good = {
        'type': 'd', 'name': np.array('x'),
        'z': np.array([1, 1]),
        'R': np.zeros((5, 2, 3)), 'F': np.zeros((5, 2, 3)),
    }
    io.validate_dataset(dict(good))
    bad = dict(good)
    bad['F'] = np.zeros((4, 2, 3))
    with pytest.raises(ValueError, match='F must match'):
        io.validate_dataset(bad)
    bad2 = dict(good)
    bad2['lattice'] = np.zeros((3, 3))
    with pytest.raises(ValueError, match='invertible'):
        io.validate_dataset(bad2)


# ---------------------------------------------------------------------------
# Validating argparse types (reference: sgdml/utils/io.py:327-708)
# ---------------------------------------------------------------------------


def _write_artifacts(tmp_path):
    from sgdml_tpu.datasets.synthetic import generate_md_dataset

    ds = generate_md_dataset(n_atoms=5, n_frames=20, seed=1)
    ds_path = str(tmp_path / 'ds.npz')
    io.save_dict(ds_path, ds)
    task = {'type': 't', 'sig': 10}
    io.save_dict(str(tmp_path / 'task.npz'), task)
    return ds, ds_path


def test_is_file_type_md5_resolution(tmp_path):
    import argparse

    ds, ds_path = _write_artifacts(tmp_path)
    md5 = io.dataset_md5(ds).decode()

    # '<dir>/<md5>' resolves to the dataset file.
    path, data = io.is_file_type(str(tmp_path / md5), 'dataset')
    assert path == ds_path
    assert io.is_dataset(data)

    # Unknown fingerprint -> clear error.
    with pytest.raises(argparse.ArgumentTypeError, match='No dataset files'):
        io.is_file_type(str(tmp_path / ('0' * 32)), 'dataset')

    # Ambiguous fingerprint (two copies) -> error listing both.
    io.save_dict(str(tmp_path / 'ds_copy.npz'), io.load_dict(ds_path))
    with pytest.raises(argparse.ArgumentTypeError, match='Multiple dataset'):
        io.is_file_type(str(tmp_path / md5), 'dataset')


def test_is_file_type_wrong_kind(tmp_path):
    import argparse

    _, ds_path = _write_artifacts(tmp_path)
    with pytest.raises(argparse.ArgumentTypeError, match='not a model file'):
        io.is_file_type(ds_path, 'model')
    with pytest.raises(argparse.ArgumentTypeError, match='not readable'):
        io.is_file_type(str(tmp_path / 'nonexistent.npz'), 'dataset')


def test_filter_and_dir_validators(tmp_path):
    import argparse

    _, ds_path = _write_artifacts(tmp_path)
    assert io.filter_file_type(str(tmp_path), 'dataset') == ['ds.npz']
    assert io.filter_file_type(str(tmp_path), 'task') == ['task.npz']
    assert io.filter_file_type(str(tmp_path), 'model') == []

    d, names = io.is_dir_with_file_type(str(tmp_path), 'dataset')
    assert names == ['ds.npz']
    # or_file: a single file acts as a one-file directory.
    d, names = io.is_dir_with_file_type(ds_path, 'dataset', or_file=True)
    assert names == ['ds.npz']
    with pytest.raises(argparse.ArgumentTypeError, match='not a directory'):
        io.is_dir_with_file_type(str(tmp_path / 'nope'), 'dataset')


def test_is_valid_file_type_and_pos_int(tmp_path):
    import argparse

    _, ds_path = _write_artifacts(tmp_path)
    path, data = io.is_valid_file_type(ds_path)
    assert io.is_dataset(data)
    path, data = io.is_valid_file_type(str(tmp_path / 'task.npz'))
    assert io.is_task(data)
    with pytest.raises(argparse.ArgumentTypeError):
        io.is_valid_file_type(str(tmp_path))

    assert io.is_strict_pos_int('7') == 7
    for bad in ('0', '-3', 'x'):
        with pytest.raises(argparse.ArgumentTypeError):
            io.is_strict_pos_int(bad)


def test_cli_md5_dataset_resolution(tmp_path, monkeypatch, capsys):
    """`show`-level check that the CLI dataset type resolves fingerprints:
    create a task via the CLI using the dataset's MD5 instead of its path."""
    from sgdml_tpu import cli

    ds, ds_path = _write_artifacts(tmp_path)
    md5 = io.dataset_md5(ds).decode()
    monkeypatch.chdir(tmp_path)
    np.random.seed(9)
    cli.main(
        ['create', md5, '10', '5', '-s', '10', '--gdml',
         '--task_dir', 'tmd5']
    )
    out = capsys.readouterr().out
    assert 'Created 1 task(s)' in out
