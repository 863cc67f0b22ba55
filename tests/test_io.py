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
