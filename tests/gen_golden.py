"""Generate golden parity fixtures by running the *reference* sGDML
implementation (NumPy path) on small synthetic systems.

Run manually:  python tests/gen_golden.py
The outputs are committed so the test suite never needs /root/reference.
"""

import os
import pathlib
import sys

import numpy as np

REF = os.environ.get('SGDML_REFERENCE', '/root/reference')
OUT = pathlib.Path(__file__).parent / 'golden'
OUT.mkdir(exist_ok=True)

sys.path.insert(0, REF)


def synthetic_geoms(rng, m, n_atoms, spread=0.1):
    base = rng.normal(size=(n_atoms, 3)) * 1.5 + np.arange(n_atoms)[:, None] * 0.7
    return base[None] + rng.normal(size=(m, n_atoms, 3)) * spread


def gen_descriptor():
    from sgdml.utils.desc import Desc

    rng = np.random.default_rng(0)
    n_atoms = 5
    r = rng.normal(size=(n_atoms, 3)) * 2.0 + np.arange(n_atoms)[:, None]
    d = Desc(n_atoms, max_processes=1)
    R_desc, R_d_desc = d.from_R(r.reshape(1, -1), max_processes=1)
    np.savez(OUT / 'descriptor_ref.npz', r=r, R_desc=R_desc, R_d_desc=R_d_desc)
    print('descriptor_ref.npz')


def gen_kernel():
    """Full kernel matrix (with and without perms / E constraints)."""
    import sgdml.train as ref_train
    from sgdml.utils.desc import Desc

    rng = np.random.default_rng(1)
    n_atoms, m = 4, 6
    R = synthetic_geoms(rng, m, n_atoms)
    desc = Desc(n_atoms, max_processes=1)
    R_desc, R_d_desc = desc.from_R(R.reshape(m, -1), max_processes=1)

    # A real permutation symmetry: swap atoms 0<->1 (same species assumed).
    perms = np.array([[0, 1, 2, 3], [1, 0, 2, 3]])
    sig = 2.0

    tril_perms = np.array([Desc.perm(p) for p in perms])
    dim_d = desc.dim
    perm_offsets = np.arange(perms.shape[0])[:, None] * dim_d
    tril_perms_lin = (tril_perms + perm_offsets).flatten('F')

    try:
        trainer = ref_train.GDMLTrain(max_processes=1)
    except Exception:
        trainer = None  # singleton already exists in this process

    for use_E_cstr, name in [(False, 'kernel_ref.npz'), (True, 'kernel_ecstr_ref.npz')]:
        K = ref_train.GDMLTrain._assemble_kernel_mat(
            trainer,
            R_desc,
            R_d_desc,
            tril_perms_lin,
            sig,
            desc,
            use_E_cstr=use_E_cstr,
        )
        np.savez(
            OUT / name,
            R=R,
            R_desc=R_desc,
            R_d_desc=R_d_desc,
            perms=perms,
            sig=sig,
            K=K,
        )
        print(name, K.shape)


def gen_train_predict():
    """End-to-end reference training + prediction on a synthetic MD
    trajectory (same generator the test/bench suite uses)."""
    import sgdml.train as ref_train
    from sgdml.predict import GDMLPredict

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    from sgdml_tpu.datasets.synthetic import generate_md_dataset

    n_atoms, m_train = 5, 30
    dataset = generate_md_dataset(n_atoms=n_atoms, n_frames=400, seed=2)
    R, E, F = dataset['R'], dataset['E'], dataset['F']

    import sgdml.train as rt

    global _trainer
    try:
        trainer = rt.GDMLTrain(max_processes=1)
    except Exception:
        import sgdml.train

        trainer = object.__new__(rt.GDMLTrain)
        trainer.log = __import__('logging').getLogger('ref')
        trainer._max_memory = 8
        trainer._max_processes = 1
        trainer._use_torch = False

    np.random.seed(7)
    task = trainer.create_task(
        dataset,
        m_train,
        dataset,
        20,
        sig=4.0,
        lam=1e-10,
        use_sym=False,
        use_E=True,
        use_E_cstr=False,
    )
    model = trainer.train(task)

    pred = GDMLPredict(model, max_processes=1)
    R_test = R[100:120].reshape(20, -1)
    e_pred, f_pred = pred.predict(R_test)

    np.savez(
        OUT / 'train_predict_ref.npz',
        z=dataset['z'],
        R=R,
        E=E,
        F=F,
        idxs_train=task['idxs_train'],
        sig=4.0,
        lam=1e-10,
        perms=task['perms'],
        alphas_F=model['alphas_F'],
        std=model['std'],
        c=model['c'],
        R_desc_model=model['R_desc'],
        R_d_desc_alpha=model['R_d_desc_alpha'],
        R_test=R_test,
        e_pred=e_pred,
        f_pred=f_pred,
    )
    print('train_predict_ref.npz  c=%.6f std=%.6f' % (model['c'], model['std']))

    # Also save the reference's complete model artifact for interop tests.
    np.savez_compressed(OUT / 'model_ref.npz', **model)
    print('model_ref.npz')


def gen_perms():
    """Reference find_perms on the symmetric synthetic molecule."""
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    from sgdml_tpu.datasets.synthetic import generate_symmetric_md_dataset
    from sgdml.utils import perm as ref_perm

    ds = generate_symmetric_md_dataset(n_frames=60, seed=0)
    R, z = ds['R'][:40], ds['z']
    perms = ref_perm.find_perms(R, z, max_processes=1)
    np.savez(OUT / 'perms_ref.npz', R=R, z=z, perms=perms)
    print('perms_ref.npz', perms.shape)


if __name__ == '__main__':
    gen_descriptor()
    gen_kernel()
    gen_train_predict()
    gen_perms()
