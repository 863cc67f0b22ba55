"""Pair-precision block Cholesky: factorization and solve accuracy.

Claims under test (ops/pairchol.py): the (f32 hi, bf16 lo) factor and
its pair-accurate solve reproduce an f64 Cholesky solve to ~1e-9
relative — far below the ~1e-6 floor of a pure-f32 factorization — on
an ill-conditioned SPD system (cond ~ 1e8, where f32 Cholesky fails
outright or loses everything).
"""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')

from sgdml_tpu.ops import pairchol  # noqa: E402
from sgdml_tpu.ops.blockchol import GridSpec  # noqa: E402


def _spd(n, cond, seed):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return (Q * eigs) @ Q.T


@pytest.fixture(scope='module')
def factored():
    n, k = 256, 4
    A = _spd(n, 1e8, 0)
    spec = GridSpec(n, k)
    Ghi, Glo = pairchol.grid_pair_from_dense64(A, spec)
    Lh, Ll = pairchol.chol_grid_pair(Ghi, Glo)
    return A, spec, Lh, Ll


def test_factor_residual_at_pair_floor(factored):
    A, spec, Lh, Ll = factored
    assert bool(pairchol.grid_pair_isfinite(Lh))
    n, b = spec.n, spec.b
    L = np.zeros((n, n))
    for i in range(spec.k):
        for j in range(i + 1):
            blk = np.asarray(pairchol.pair_to_f64(Lh[i][j], Ll[i][j]))
            if i == j:
                blk = np.tril(blk)
            L[i * b : (i + 1) * b, j * b : (j + 1) * b] = blk
    resid = np.abs(L @ L.T - A).max() / np.abs(A).max()
    # bf16 lo => ~2^-32 elementwise storage; allow modest growth.
    assert resid < 1e-8


def _dense_factor(spec, Lh, Ll):
    n, b = spec.n, spec.b
    L = np.zeros((n, n))
    for i in range(spec.k):
        for j in range(i + 1):
            blk = np.asarray(pairchol.pair_to_f64(Lh[i][j], Ll[i][j]))
            if i == j:
                blk = np.tril(blk)
            L[i * b : (i + 1) * b, j * b : (j + 1) * b] = blk
    return L


def test_solve_applies_pair_factor_faithfully(factored):
    """solve_grid_pair must equal an f64 dense solve with the SAME pair
    factor (the preconditioner analysis needs the *application* to be
    pair-accurate; an f32-applied factor would floor CG at 2 eps32
    ||A||). The A-solve error itself is cond * eps_pair — backward-error
    theory, not a defect."""
    A, spec, Lh, Ll = factored
    rng = np.random.default_rng(1)
    y = rng.standard_normal(spec.n)
    Dinv = pairchol.leaf_inverses(Lh, Ll)
    x = np.asarray(pairchol.solve_grid_pair(Lh, Ll, Dinv, jnp.asarray(y)))
    L = _dense_factor(spec, Lh, Ll)
    want = np.linalg.solve(L.T, np.linalg.solve(L, y))
    rel = np.linalg.norm(x - want) / np.linalg.norm(want)
    assert rel < 1e-9


def test_solve_matrix_rhs(factored):
    A, spec, Lh, Ll = factored
    rng = np.random.default_rng(2)
    Y = rng.standard_normal((spec.n, 3))
    Dinv = pairchol.leaf_inverses(Lh, Ll)
    X = np.asarray(pairchol.solve_grid_pair(Lh, Ll, Dinv, jnp.asarray(Y)))
    L = _dense_factor(spec, Lh, Ll)
    want = np.linalg.solve(L.T, np.linalg.solve(L, Y))
    rel = np.linalg.norm(X - want) / np.linalg.norm(want)
    assert rel < 1e-9


def test_indefinite_yields_nan():
    n, k = 128, 2
    A = _spd(n, 10, 3)
    A[0, 0] = -5.0  # break positive definiteness
    spec = GridSpec(n, k)
    Ghi, Glo = pairchol.grid_pair_from_dense64(A, spec)
    Lh, _ = pairchol.chol_grid_pair(Ghi, Glo)
    assert not bool(pairchol.grid_pair_isfinite(Lh))


def test_solve_strips_matches_grid_solve(factored):
    A, spec, Lh, Ll = factored
    rng = np.random.default_rng(7)
    y = rng.standard_normal(spec.n)
    Dinv = pairchol.leaf_inverses(Lh, Ll)
    want = np.asarray(pairchol.solve_grid_pair(Lh, Ll, Dinv, jnp.asarray(y)))
    # strips_from_grid consumes the grid: hand it copies.
    Lh_c = [list(r) for r in Lh]
    Ll_c = [list(r) for r in Ll]
    strips = pairchol.strips_from_grid(Lh_c, Ll_c)
    got = np.asarray(pairchol.solve_strips(strips, Dinv, jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_solve_strips_int8_matches_grid_solve(factored):
    A, spec, Lh, Ll = factored
    rng = np.random.default_rng(8)
    y = rng.standard_normal(spec.n)
    Dinv = pairchol.leaf_inverses(Lh, Ll)
    want = np.asarray(pairchol.solve_grid_pair(Lh, Ll, Dinv, jnp.asarray(y)))
    Lh_c = [list(r) for r in Lh]
    Ll_c = [list(r) for r in Ll]
    sstrips = pairchol.int8_strips(pairchol.strips_from_grid(Lh_c, Ll_c))
    Dsl = pairchol.slice_leaf_inverses(list(Dinv))
    got = np.asarray(
        pairchol.solve_strips_int8(sstrips, Dsl, jnp.asarray(y))
    )
    # int8-sliced application: ~2^-36 operand truncation, amplified by
    # the fixture's cond=1e8 in the solve output (measured ~8e-8). As a
    # CG preconditioner only operator-norm closeness matters.
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-5


def test_pair_assembly_ozaki_mode_matches_native():
    """assemble_kernel_grid_pair(mm='ozaki') reproduces the native pair
    assembly to below the pair-storage floor."""
    import jax.numpy as jnp

    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.ops import blockchol as bc
    from sgdml_tpu.ops.descriptor import descriptor_batch
    from sgdml_tpu.ops.kernel import assemble_kernel_grid_pair

    n_atoms, m = 5, 16
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 2, seed=6)
    R = ds['R'][:m].reshape(m, -1)
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]
    dim_i = 3 * n_atoms
    spec = bc.grid_spec(m * dim_i, target_block=8 * dim_i, align=dim_i)

    def dense(mm):
        Ghi, Glo = assemble_kernel_grid_pair(
            X, Jc, dperms, 4.0, n_atoms, spec, mm=mm
        )
        out = np.zeros((spec.n, spec.n))
        for i in range(spec.k):
            for j in range(i + 1):
                blk = np.asarray(Ghi[i][j], dtype=np.float64) + np.asarray(
                    Glo[i][j], dtype=np.float64
                )
                out[i * spec.b:(i + 1) * spec.b,
                    j * spec.b:(j + 1) * spec.b] = blk
        return out

    a_native, a_ozaki = dense('native'), dense('ozaki')
    scale = np.abs(a_native).max()
    assert np.abs(a_ozaki - a_native).max() < 1e-9 * scale
