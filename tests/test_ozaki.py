"""Ozaki int8-slice GEMM: exactness and accuracy properties.

The claims under test (ops/ozaki.py): slice decomposition reconstructs
the operand to ~2^-36 of the row scale, and the GEMM matches a true f64
product to the slice-truncation bound — crucially with NO sqrt(K)
accumulation-error growth (the property an f32 MXU product cannot give).
"""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')

from sgdml_tpu.ops import ozaki  # noqa: E402


def _rand(m, k, seed, scale_spread=1.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, k))
    # Per-row magnitude spread stresses the row scaling.
    a *= np.exp(scale_spread * rng.standard_normal((m, 1)))
    return a


def test_split_reconstructs_f32_to_row_scale():
    """4 slices capture an f32 operand down to 2^-25 of the row scale
    (the truncation is row-scaled absolute, as in the backward-error
    model of the pair Cholesky — not elementwise relative)."""
    a64 = _rand(64, 96, 0)
    hi = np.float32(a64)
    slices, sigma = ozaki.split_pair_int8(jnp.asarray(hi), n_slices=4)
    s = np.asarray(slices, dtype=np.float64)
    sig = np.asarray(sigma, dtype=np.float64)
    rec = sum(
        s[i] * 2.0 ** (-ozaki.Q_BITS * (i + 1)) for i in range(4)
    ) * sig
    err = np.abs(rec - np.float64(hi)) / sig
    assert err.max() <= 2.0 ** (-ozaki.Q_BITS * 4 - 1)


def test_split_pair_covers_lo():
    a64 = _rand(32, 48, 1)
    hi = np.float32(a64)
    lo = np.float32(a64 - np.float64(hi))
    slices, sigma = ozaki.split_pair_int8(
        jnp.asarray(hi), jnp.asarray(lo), n_slices=6
    )
    s = np.asarray(slices, dtype=np.float64)
    sig = np.asarray(sigma, dtype=np.float64)
    rec = sum(
        s[i] * 2.0 ** (-ozaki.Q_BITS * (i + 1)) for i in range(6)
    ) * sig
    err = np.abs(rec - a64) / sig
    assert err.max() <= 2.0 ** (-ozaki.Q_BITS * 6 + 1)


@pytest.mark.parametrize('k', [96, 1024])
def test_gemm_matches_f64(k):
    a64 = _rand(48, k, 2, scale_spread=2.0)
    b64 = _rand(56, k, 3, scale_spread=2.0)
    ah, al = np.float32(a64), np.float32(a64 - np.float64(np.float32(a64)))
    bh, bl = np.float32(b64), np.float32(b64 - np.float64(np.float32(b64)))
    got = np.asarray(
        ozaki.ozaki_gemm_nt(
            jnp.asarray(ah), jnp.asarray(bh),
            lo_a=jnp.asarray(al), lo_b=jnp.asarray(bl),
        )
    )
    want = a64 @ b64.T
    # Error bound: per-entry slice truncation 2^{-q S} per operand,
    # accumulated over K terms (with slack; measured ~sqrt(K) growth).
    sa = 2.0 ** np.ceil(np.log2(np.abs(a64).max(1, keepdims=True)))
    sb = 2.0 ** np.ceil(np.log2(np.abs(b64).max(1, keepdims=True)))
    bound = 8.0 * k * 2.0 ** (-ozaki.Q_BITS * ozaki.DEFAULT_SLICES) * (
        sa * sb.T
    )
    assert np.all(np.abs(got - want) <= bound)
    # And the practical headline: ~1e-9 relative at unit scales.
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-8


def test_gemm_no_sqrt_k_growth():
    """f32-stored inputs, long contraction: the Ozaki product of the
    *stored* values is exact, where a HIGHEST-precision f32 matmul has
    sqrt(K)-grown rounding noise."""
    k = 4096
    rng = np.random.default_rng(7)
    a = np.float32(rng.standard_normal((16, k)))
    b = np.float32(rng.standard_normal((16, k)))
    got = np.asarray(ozaki.ozaki_gemm_nt(jnp.asarray(a), jnp.asarray(b)))
    want = np.float64(a) @ np.float64(b).T
    # Truncation-only bound, unaffected by K's accumulation order.
    assert np.abs(got - want).max() < k * 2.0 ** (-42) * 4 * 4
    # f32 inputs are captured by 4 slices exactly: tighten to near-zero.
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-9


def test_contraction_dim_guard():
    a = jnp.zeros((4, 2**19))
    with pytest.raises(ValueError):
        ozaki.ozaki_gemm_nt(a, a)


def test_matvec_sliced_both_orientations():
    """Global-scale slice stacks: A v and A^T v from ONE decomposition,
    at ~2^-45 relative (48-bit slices on f64 input)."""
    rng = np.random.default_rng(11)
    A = rng.standard_normal((96, 64))
    v1 = rng.standard_normal(64)
    v2 = rng.standard_normal((96, 3))
    sa, sig = ozaki.split_global_int8(jnp.asarray(A))
    got = np.asarray(ozaki.matvec_sliced(sa, sig, jnp.asarray(v1)))
    np.testing.assert_allclose(got, A @ v1, rtol=0, atol=1e-11 * np.abs(A @ v1).max() + 1e-12)
    gotT = np.asarray(
        ozaki.matvec_sliced(sa, sig, jnp.asarray(v2), transpose=True)
    )
    np.testing.assert_allclose(gotT, A.T @ v2, rtol=0, atol=1e-11 * np.abs(A.T @ v2).max() + 1e-12)


def test_matvec_sliced_long_roundtrip():
    """Chunked long-contraction matvec (and its transpose) with per-chunk
    scales must reproduce the f64 product to slice-truncation accuracy."""
    import jax.numpy as jnp

    from sgdml_tpu.ops import ozaki

    rng = np.random.default_rng(5)
    k, chunk, n_ch = 37, 256, 5
    n = chunk * n_ch
    A = rng.normal(size=(k, n)) * np.exp(rng.normal(size=(k, 1)))
    v = rng.normal(size=(n,))
    w = rng.normal(size=(k,))

    # Per-chunk slicing, as the factor build produces it.
    s_chunks, sigs = [], []
    for c in range(n_ch):
        s, sig = ozaki.split_global_int8(
            jnp.asarray(A[:, c * chunk : (c + 1) * chunk]), n_slices=8
        )
        s_chunks.append(s)
        sigs.append(sig)
    sa = jnp.concatenate(s_chunks, axis=2)
    sigma = jnp.stack(sigs)

    out = np.asarray(ozaki.matvec_sliced_long(sa, sigma, jnp.asarray(v),
                                              chunk=chunk))
    ref = A @ v
    assert np.max(np.abs(out - ref)) < 1e-10 * np.abs(ref).max()

    out_t = np.asarray(
        ozaki.matvec_sliced_long_t(sa, sigma, jnp.asarray(w), chunk=chunk)
    )
    ref_t = A.T @ w
    assert np.max(np.abs(out_t - ref_t)) < 1e-10 * np.abs(ref_t).max()

    # Scalar-sigma variant (single global scale).
    s1, sig1 = ozaki.split_global_int8(jnp.asarray(A), n_slices=8)
    out1 = np.asarray(ozaki.matvec_sliced_long(s1, sig1, jnp.asarray(v),
                                               chunk=chunk))
    assert np.max(np.abs(out1 - ref)) < 1e-10 * np.abs(ref).max()
