"""Converter script tests: extxyz round trip, i-PI path, model-subset
extraction, downloader catalog."""

import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.scripts import (
    dataset_from_extxyz,
    dataset_from_ipi,
    dataset_to_extxyz,
    datasets_from_model,
)
from sgdml_tpu.utils import io


@pytest.fixture(scope='module')
def ds():
    return generate_md_dataset(n_atoms=4, n_frames=25, seed=8)


def test_extxyz_roundtrip(ds, tmp_path):
    npz_in = str(tmp_path / 'in.npz')
    io.save_dict(npz_in, ds)
    xyz = str(tmp_path / 'out.xyz')
    dataset_to_extxyz.main([npz_in, '-o', xyz])

    npz_out = str(tmp_path / 'roundtrip.npz')
    dataset_from_extxyz.main([xyz, '-o', npz_out, '--name', 'rt'])
    ds2 = io.load_dict(npz_out)

    np.testing.assert_array_equal(ds2['z'], ds['z'])
    np.testing.assert_allclose(ds2['R'], ds['R'], rtol=1e-9)
    np.testing.assert_allclose(ds2['F'], ds['F'], rtol=1e-9)
    np.testing.assert_allclose(ds2['E'], ds['E'], rtol=1e-9)


def test_ipi_conversion(ds, tmp_path):
    n_atoms = ds['R'].shape[1]
    pos = str(tmp_path / 'pos.xyz')
    frc = str(tmp_path / 'frc.xyz')
    props = str(tmp_path / 'props.out')
    with open(pos, 'w') as fp, open(frc, 'w') as ff:
        for i in range(len(ds['R'])):
            for fh, arr in ((fp, ds['R'][i]), (ff, ds['F'][i])):
                fh.write('%d\nframe\n' % n_atoms)
                for zi, row in zip(ds['z'], arr):
                    fh.write(
                        '%s %.10f %.10f %.10f\n'
                        % (io.Z_TO_SYMBOL[int(zi)], *row)
                    )
    with open(props, 'w') as fh:
        fh.write('# step time potential\n')
        for i, e in enumerate(ds['E']):
            fh.write('%d 0.0 %.10f\n' % (i, e))

    out = str(tmp_path / 'ipi.npz')
    dataset_from_ipi.main([pos, frc, props, '-o', out])
    ds2 = io.load_dict(out)
    np.testing.assert_allclose(ds2['R'], ds['R'], rtol=1e-9)
    np.testing.assert_allclose(ds2['E'], ds['E'], rtol=1e-9)


def test_datasets_from_model(ds, tmp_path, monkeypatch):
    from sgdml_tpu.train import GDMLTrain

    trainer = GDMLTrain()
    np.random.seed(2)
    task = trainer.create_task(ds, 10, ds, 5, sig=5.0, use_sym=False)
    model = trainer.train(task, solver='analytic')

    mpath = str(tmp_path / 'model.npz')
    dpath = str(tmp_path / 'data.npz')
    io.save_dict(mpath, model)
    io.save_dict(dpath, ds)

    monkeypatch.chdir(tmp_path)
    datasets_from_model.main([mpath, dpath, '-o', 'sub'])
    train_sub = io.load_dict(str(tmp_path / 'sub_train.npz'))
    assert train_sub['R'].shape[0] == 10
    np.testing.assert_allclose(
        train_sub['R'], ds['R'][np.asarray(model['idxs_train'])]
    )


def test_downloader_catalog():
    from sgdml_tpu import download

    assert download.resolve('ethanol') == 'md17_ethanol.npz'
    assert download.resolve('AT-AT') == 'md22_AT-AT.npz'
    with pytest.raises(SystemExit):
        download.resolve('definitely_not_a_molecule')


def test_model_wrapper(ds, tmp_path):
    from sgdml_tpu.models import GDMLModel
    from sgdml_tpu.train import GDMLTrain

    trainer = GDMLTrain()
    np.random.seed(4)
    task = trainer.create_task(ds, 10, ds, 5, sig=5.0, use_sym=False)
    model_dict = trainer.train(task, solver='analytic')
    path = str(tmp_path / 'm.npz')
    io.save_dict(path, model_dict)

    m = GDMLModel.load(path)
    assert m.n_atoms == 4 and m.n_train == 10 and m.solver == 'analytic'
    pred = m.predictor()
    E, F = pred.predict(ds['R'][:3].reshape(3, -1))
    assert np.isfinite(E).all()


def test_ui_helpers(capsys):
    from sgdml_tpu.utils import ui

    ui.callback(ui.DONE, disp_str='step done')
    ui.callback(5, 10, disp_str='halfway')
    s, w = ui.gen_mat_str(np.eye(2))
    assert '1.0' in s
    assert ui.gen_memory_str(2048) == '2.0 KB'
    assert 'abc' == ui.strip_ansi(ui.color_str('abc', fore='red', bold=True))
