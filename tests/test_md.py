"""On-device MD tests: NVE energy conservation and Langevin stability
(BASELINE.md config 5 analog), plus the ASE calculator import gate."""

import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.md import MDEngine
from sgdml_tpu.train import GDMLTrain


@pytest.fixture(scope='module')
def model_and_ds():
    ds = generate_md_dataset(n_atoms=5, n_frames=500, seed=3)
    trainer = GDMLTrain()
    np.random.seed(17)
    task = trainer.create_task(
        ds, 80, ds, 20, sig=6.0, lam=1e-12, use_sym=False, use_E=True
    )
    model = trainer.train(task, solver='analytic')
    return model, ds


def test_nve_energy_conservation(model_and_ds):
    model, ds = model_and_ds
    engine = MDEngine(model)
    r0 = ds['R'][0]
    v0 = np.zeros_like(r0)

    R, V, E_pot, E_kin = engine.run_nve(r0, v0, dt=0.01, n_steps=500,
                                        snapshot_every=10)
    E_tot = E_pot + E_kin
    drift = np.abs(E_tot - E_tot[0]).max()
    scale = max(np.abs(E_kin).max(), 1e-3)
    assert drift < 0.05 * scale, (drift, scale)
    # The trajectory must actually move.
    assert np.abs(R[-1] - R[0]).max() > 1e-4


def test_default_masses_from_z(model_and_ds):
    """MDEngine derives physical masses from the model's atomic numbers by
    default (reference gets them from ASE, sgdml/intf/ase_calc.py)."""
    model, ds = model_and_ds
    from sgdml_tpu.utils.io import ATOMIC_MASSES

    engine = MDEngine(model)
    expect = ATOMIC_MASSES[np.asarray(model['z'], dtype=np.int64)]
    np.testing.assert_allclose(np.asarray(engine.masses), expect)
    assert not np.allclose(np.asarray(engine.masses), 1.0)
    # Hydrogen is ~1 u; carbon ~12 u — sanity-anchor two common species.
    assert abs(ATOMIC_MASSES[1] - 1.008) < 1e-3
    assert abs(ATOMIC_MASSES[6] - 12.011) < 1e-3


def test_md_forces_match_predictor(model_and_ds):
    model, ds = model_and_ds
    from sgdml_tpu.predict import GDMLPredict

    engine = MDEngine(model)
    pred = GDMLPredict(model)
    r = ds['R'][7]
    E1, F1 = engine.energy_forces(np.asarray(r))
    E2, F2 = pred.predict(r.reshape(1, -1))
    np.testing.assert_allclose(float(E1), E2[0], rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(F1).ravel(), F2[0], rtol=1e-9, atol=1e-12
    )


def test_langevin_runs_stable(model_and_ds):
    model, ds = model_and_ds
    engine = MDEngine(model)
    r0 = ds['R'][0]
    v0 = np.zeros_like(r0)
    R, V, E_pot, E_kin = engine.run_langevin(
        r0, v0, dt=0.01, n_steps=200, friction=0.1, kT=0.02,
        snapshot_every=20,
    )
    assert np.isfinite(R).all() and np.isfinite(E_pot).all()


def test_ase_calculator_gate():
    """Without ASE installed, the calculator raises a clear ImportError."""
    try:
        import ase  # noqa: F401

        pytest.skip('ASE installed; gate not exercised')
    except ImportError:
        pass
    from sgdml_tpu.intf.ase_calc import SGDMLCalculator

    with pytest.raises(ImportError, match='ASE'):
        SGDMLCalculator('nonexistent.npz')
