"""Streaming two-pass Nystrom factor build (solvers/iterative.py
``_build_factor_streamed``): range-assembly parity, factor parity with
the one-pass slice build, the streamed memory formula, and the
use_E_cstr fallback. Reference counterpart: the in-place factor pipeline
of sgdml/solvers/iterative.py:208-351 (which assumes a 100+ GB host)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.ops.descriptor import descriptor_batch
from sgdml_tpu.ops.kernel import (
    assemble_kernel_columns,
    assemble_kernel_columns_range,
)
from sgdml_tpu.solvers.iterative import (
    Iterative,
    _factor_apply_ozaki,
    _nystrom_factor_from_cols,
)
from sgdml_tpu.train import GDMLTrain

SIG = 8.0
LAM = 1e-10


@pytest.fixture(scope='module')
def setup():
    ds = generate_md_dataset(n_atoms=6, n_frames=120, seed=7)
    n_atoms, m = 6, 40
    R = ds['R'][:m].reshape(m, -1)
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]
    np.random.seed(3)
    cols = np.sort(
        np.random.choice(m * 3 * n_atoms, 2 * 3 * n_atoms, replace=False)
    )
    return X, Jc, dperms, n_atoms, m, cols


def test_range_assembly_matches_full(setup):
    """A chunked sweep of assemble_kernel_columns_range (with a padded
    tail chunk) reproduces assemble_kernel_columns exactly."""
    X, Jc, dperms, n_atoms, m, cols = setup
    dim_i = 3 * n_atoms
    full = np.asarray(
        assemble_kernel_columns(X, Jc, dperms, SIG, n_atoms, cols)
    )
    pt_ch = 7  # does not divide m=40: exercises the masked padded tail
    n_ch = -(-m // pt_ch)
    m_pad = n_ch * pt_ch
    Xp = jnp.pad(X, ((0, m_pad - m), (0, 0)))
    Jcp = jnp.pad(Jc, ((0, m_pad - m), (0, 0), (0, 0)))
    chunks = [
        np.asarray(
            assemble_kernel_columns_range(
                Xp, Jcp, dperms, SIG, n_atoms, cols, c * pt_ch, pt_ch, m
            )
        )
        for c in range(n_ch)
    ]
    got = np.concatenate(chunks)
    # Padded-point rows must be exactly zero (they feed the Gram).
    assert np.all(got[m * dim_i:] == 0.0)
    np.testing.assert_allclose(got[: m * dim_i], full, rtol=0, atol=1e-12)


def test_streamed_factor_matches_one_pass(setup):
    """The streamed factor's Woodbury apply and leverage scores agree
    with the one-pass (assemble-everything) slice build."""
    X, Jc, dperms, n_atoms, m, cols = setup
    n = m * 3 * n_atoms

    solver = Iterative(GDMLTrain(), factor_mode='ozaki')
    Fs, lev_s = solver._build_factor_streamed(
        X, Jc, dperms, SIG, LAM, cols, n_atoms
    )
    F1, lev_1, ok = _nystrom_factor_from_cols(
        -assemble_kernel_columns(X, Jc, dperms, SIG, n_atoms, cols),
        cols, LAM, 0.0, 0.0, to_slices=True,
    )
    assert ok

    # Leverage scores: plain sums of F^2 (no cancellation) — tight.
    np.testing.assert_allclose(
        lev_s, np.asarray(lev_1)[:n], rtol=1e-6, atol=1e-12
    )

    # Woodbury apply parity on a random vector (the two stacks may be
    # zero-padded to different widths; compare the real rows).
    v = np.random.default_rng(0).standard_normal(n)

    def apply(F):
        sF, sigF = F
        vp = jnp.pad(jnp.asarray(v), (0, sF.shape[2] - n))
        return np.asarray(_factor_apply_ozaki(sF, sigF, vp))[:n]

    za, zb = apply(Fs), apply(F1)
    assert np.linalg.norm(za - zb) / np.linalg.norm(v) < 1e-7


def test_streamed_budget_exceeds_one_pass():
    """The streamed build's k-cap at MD22 M=3000 scale must exceed the
    one-pass slice build's (the round-2/3 single-chip bottleneck: the
    f64 column block + Y chunks no longer coexist with the stack)."""
    mem = 15.5 * 1024**3
    cap_1 = Iterative.max_n_inducing_pts(3000, 60, mem, factor_bytes=9.0)
    cap_s = Iterative.max_n_inducing_pts(
        3000, 60, mem, factor_bytes=9.0, streamed=True
    )
    assert cap_s >= 2 * cap_1
    assert cap_s >= 10


def test_e_cstr_streams_and_matches_one_pass(setup):
    """use_E_cstr now builds via the STREAM (force sweeps chunked by an
    exact divisor of M, the (M, k) energy-row border assembled once and
    appended as tail chunks) and its Woodbury apply matches the one-pass
    E-constrained slice build — large energy-constrained systems get the
    streamed k-cap instead of the one-pass f64 fallback (round-3 verdict
    missing #3)."""
    X, Jc, dperms, n_atoms, m, cols = setup
    n = m * 3 * n_atoms + m  # extended system: force rows + E rows
    solver = Iterative(GDMLTrain(), factor_mode='ozaki')
    Fs, lev_s = solver._build_factor(
        X, Jc, dperms, SIG, LAM, cols, n_atoms, use_E_cstr=True
    )
    assert lev_s.shape[0] == n

    F1, lev_1, ok = _nystrom_factor_from_cols(
        -assemble_kernel_columns(
            X, Jc, dperms, SIG, n_atoms, cols, use_E_cstr=True
        ),
        cols, LAM, 0.0, 0.0, to_slices=True,
    )
    assert ok
    np.testing.assert_allclose(
        lev_s, np.asarray(lev_1)[:n], rtol=1e-6, atol=1e-12
    )

    v = np.random.default_rng(0).standard_normal(n)

    def apply(F):
        sF, sigF = F
        vp = jnp.pad(jnp.asarray(v), (0, sF.shape[2] - n))
        return np.asarray(_factor_apply_ozaki(sF, sigF, vp))[:n]

    za, zb = apply(Fs), apply(F1)
    assert np.linalg.norm(za - zb) / np.linalg.norm(v) < 1e-7


def test_e_rows_matmul_form_matches_one_pass(setup):
    """assemble_kernel_E_rows (matmul/norm-expansion form — no
    (I, C, P, D) difference tensor, the MD22 M=1000 k=35 compile-OOM)
    matches the one-pass assembly's E block, including under a
    nontrivial permutation group."""
    from sgdml_tpu.ops.kernel import assemble_kernel_E_rows
    from sgdml_tpu.train import desc_perm_table

    X, Jc, dperms_id, n_atoms, m, cols = setup
    dim_i = 3 * n_atoms
    perms = np.stack([np.arange(n_atoms), np.array([1, 0, 2, 3, 5, 4])])
    for dperms in (dperms_id, desc_perm_table(perms)):
        full = np.asarray(
            assemble_kernel_columns(
                X, Jc, dperms, SIG, n_atoms, cols, use_E_cstr=True
            )
        )[m * dim_i:]
        got = np.asarray(
            assemble_kernel_E_rows(X, Jc, dperms, SIG, n_atoms, cols)
        )
        np.testing.assert_allclose(got, full, rtol=1e-10, atol=1e-11)


def test_six_slice_factor_is_psd_and_close(setup):
    """factor_slices=6 (7 B/elem — the single-chip capacity fallback):
    the streamed build renormalizes the stack so the represented
    ``I - F^T F`` stays PSD, and the Woodbury apply agrees with the
    8-slice stack to well inside the CG tolerance."""
    from sgdml_tpu.solvers.iterative import _gram_apply_fn

    X, Jc, dperms, n_atoms, m, cols = setup
    n = m * 3 * n_atoms

    factors = {}
    for ns in (8, 6):
        solver = Iterative(
            GDMLTrain(), factor_mode='ozaki', factor_slices=ns
        )
        F, lev = solver._build_factor_streamed(
            X, Jc, dperms, SIG, LAM, cols, n_atoms
        )
        assert F[0].shape[0] == ns
        factors[ns] = F

    # Represented spectral norm of the 6-slice stack stays below 1
    # (power iteration on the truncated operator itself).
    sF, sigF = factors[6]
    step = _gram_apply_fn()
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(sF.shape[2]))
    v = v / jnp.linalg.norm(v)
    nrm = None
    for _ in range(60):
        v, nrm = step(sF, sigF, v)
    assert float(nrm) <= 1.0, float(nrm)

    # Apply parity between the stacks at the CG-tolerance level.
    w = rng.standard_normal(n)

    def apply(F):
        sF, sigF = F
        wp = jnp.pad(jnp.asarray(w), (0, sF.shape[2] - n))
        return np.asarray(_factor_apply_ozaki(sF, sigF, wp))[:n]

    z8, z6 = apply(factors[8]), apply(factors[6])
    assert np.linalg.norm(z6 - z8) / np.linalg.norm(w) < 1e-5


def test_six_slice_budget_exceeds_eight():
    """factor_slices=6 lifts the streamed inducing-point cap ~9/7 over
    the 8-slice default in the same per-device budget."""
    mem = 15.5 * 1024**3
    cap8 = Iterative.max_n_inducing_pts(
        3000, 60, mem, factor_bytes=9.0, streamed=True
    )
    cap6 = Iterative.max_n_inducing_pts(
        3000, 60, mem, factor_bytes=7.0, streamed=True
    )
    assert cap6 > cap8
