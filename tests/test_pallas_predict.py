"""Pallas fused inference kernel: interpreter-mode correctness vs the XLA
path (the TPU-compiled path is benchmarked on hardware, not here)."""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')

from sgdml_tpu.ops.pallas_predict import HAS_PALLAS, pallas_predict_tables
from sgdml_tpu.predict import build_tables, predict_from_tables
from sgdml_tpu.ops import descriptor as desc_ops
from sgdml_tpu.train import desc_perm_table
from sgdml_tpu.datasets.synthetic import generate_md_dataset


@pytest.mark.skipif(not HAS_PALLAS, reason='pallas unavailable')
def test_pallas_matches_xla_path():
    ds = generate_md_dataset(n_atoms=6, n_frames=80, seed=5)
    n_atoms, sig = 6, 7.0
    m = 40
    R = ds['R'][:m].reshape(m, -1)
    X, Jc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = desc_perm_table(np.arange(n_atoms)[None])
    rng = np.random.default_rng(0)
    JA_flat = jnp.asarray(rng.normal(size=(m, X.shape[1])))
    Xt, JA = build_tables(X, JA_flat, dperms)

    Rq = ds['R'][m : m + 17].reshape(17, -1)  # deliberately unaligned B
    Xq, Jcq = desc_ops.descriptor_batch(jnp.asarray(Rq), n_atoms)

    # Reference: XLA path in f32 (same precision class).
    E_ref, F_ref = predict_from_tables(
        jnp.asarray(Xq, jnp.float32),
        jnp.asarray(Jcq, jnp.float32),
        jnp.asarray(Xt, jnp.float32),
        jnp.asarray(JA, jnp.float32),
        None, sig, 1.0, 0.0, n_atoms=n_atoms,
    )

    E_pal, F_d = pallas_predict_tables(
        Xq, Xt, JA, sig, tile_b=8, tile_t=16, interpret=True
    )
    F_pal = desc_ops.vec_dot_jac(
        jnp.asarray(Jcq, jnp.float32), jnp.asarray(F_d), n_atoms
    )

    scale_e = max(np.abs(np.asarray(E_ref)).max(), 1e-6)
    scale_f = max(np.abs(np.asarray(F_ref)).max(), 1e-6)
    assert np.abs(np.asarray(E_pal) - np.asarray(E_ref)).max() / scale_e < 1e-4
    assert np.abs(np.asarray(F_pal) - np.asarray(F_ref)).max() / scale_f < 1e-4
