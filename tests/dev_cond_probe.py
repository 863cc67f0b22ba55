"""Dev probe: condition number of the assembled kernel system K_lam = -K + lam I
for realistic task settings, on the real TPU.

Decides the large-M analytic design: cond < ~1e7 permits an f32-stored
factor + f64 iterative refinement (fits aspirin-M=1000 packed in HBM);
larger cond forces 8-byte factor precision.

Run directly: python tests/dev_cond_probe.py
"""
import timeit

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_enable_x64', True)

from sgdml_tpu.datasets import synthetic
from sgdml_tpu.ops.descriptor import descriptor_batch, perm_to_desc_perm
from sgdml_tpu.ops.kernel import assemble_kernel


def cond_probe(n_atoms_name, m, sig, lam=1e-10, seed=0):
    ds = synthetic.generate_md_dataset(
        synthetic.SYSTEMS[n_atoms_name], n_frames=m + 10, seed=seed
    )
    R = ds['R'][:m]
    F = ds['F'][:m]
    n_atoms = R.shape[1]
    X, Jc = descriptor_batch(jnp.asarray(R.reshape(m, -1)), n_atoms)
    desc_perms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]

    K = assemble_kernel(X, Jc, desc_perms, float(sig), n_atoms)
    K.block_until_ready()
    n = K.shape[0]

    std = np.std(F)
    y = jnp.asarray(F.reshape(-1) / std)

    A = -K + lam * jnp.eye(n, dtype=K.dtype)

    # lambda_max via power iteration on device
    @jax.jit
    def power(A, v):
        def body(i, v):
            w = A @ v
            return w / jnp.linalg.norm(w)
        v = jax.lax.fori_loop(0, 60, body, v)
        w = A @ v
        return jnp.vdot(v, w) / jnp.vdot(v, v)

    v0 = jnp.ones((n,), dtype=A.dtype)
    lmax = float(power(A, v0))

    # lambda_min via inverse power iteration using Cholesky solve
    L = jnp.linalg.cholesky(A)
    ok = bool(jnp.all(jnp.isfinite(L)))

    @jax.jit
    def inv_power(L, v):
        def solve(v):
            z = jax.scipy.linalg.solve_triangular(L, v, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        def body(i, v):
            w = solve(v)
            return w / jnp.linalg.norm(w)
        v = jax.lax.fori_loop(0, 60, body, v)
        w = solve(v)
        return jnp.vdot(v, w) / jnp.vdot(v, v)

    lmin_inv = float(inv_power(L, v0)) if ok else float('nan')
    lmin = 1.0 / lmin_inv if ok else float('nan')
    print(
        f'{n_atoms_name} m={m} sig={sig} lam={lam:g}: n={n} '
        f'diag_mean={float(jnp.mean(jnp.diag(A))):.3e} '
        f'lmax={lmax:.4e} lmin={lmin:.4e} cond={lmax/lmin:.3e} chol_ok={ok}',
        flush=True,
    )


if __name__ == '__main__':
    for sig in (10.0, 20.0, 50.0):
        cond_probe('aspirin_like', 200, sig)
    cond_probe('aspirin_like', 400, 20.0)
    cond_probe('ethanol_like', 200, 20.0)
