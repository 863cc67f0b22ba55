"""Dev measurement: can a second preconditioner level (block-Jacobi) or
Nystrom-basis deflation cut the CG iteration count at equal memory
budget? (VERDICT r4 item #7 — measurement-gated: land production
machinery only if a feasible-scale run shows >=1.3x iteration
reduction.)

Dense host prototype: small enough to build K explicitly, large enough
that the Nystrom preconditioner is genuinely low-rank (k << m). All
variants run IDENTICAL CG code on the same operator; only M changes.

Variants:
  nys      — production Woodbury: M^-1 = (1/lam)(I - F^T F)
  bj       — block-Jacobi alone: M^-1 = blockdiag(A)^-1
  nys+bj   — two-level additive: M^-1 = Q(W_hat)Q^T + P B^-1 P^T with
             P = I - F^T F (the Nystrom complement projector-ish);
             symmetric PSD by construction.
  adef2    — A-DEF2 deflation (Tang et al. 2009): Z = Nystrom columns,
             M = block-Jacobi; P = I - A Z E^-1 Z^T,
             M_adef2 = P^T M^-1 P + Z E^-1 Z^T (SPD for SPD M).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def pcg(A, b, Minv, tol=1e-4, maxit=20000):
    x = np.zeros_like(b)
    r = b.copy()
    z = Minv(r)
    p = z.copy()
    rz = r @ z
    bn = np.linalg.norm(b)
    for it in range(maxit):
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) <= tol * bn:
            return x, it + 1
        z = Minv(r)
        rz_new = r @ z
        beta = rz_new / rz
        rz = rz_new
        p = z + beta * p
    return x, maxit


def main():
    import jax.numpy as jnp

    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.ops.descriptor import descriptor_batch, descriptor_dim
    from sgdml_tpu.ops.kernel import assemble_kernel
    from sgdml_tpu.train import GDMLTrain

    n_atoms, m, sig, lam = 9, 300, 10.0, 1e-10
    k_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 100, seed=3)
    trainer = GDMLTrain()
    np.random.seed(1)
    task = trainer.create_task(
        ds, m, ds, 50, sig=sig, lam=lam, use_sym=False, use_E=True
    )
    R = task['R_train'].reshape(m, -1)
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(descriptor_dim(n_atoms))[None, :]
    dim_i = 3 * n_atoms
    n = m * dim_i

    K = np.asarray(
        assemble_kernel(X, Jc, dperms, sig, n_atoms, use_E_cstr=False)
    )
    A = -K + lam * np.eye(n)
    y = task['F_train'].ravel()
    b = y / np.std(y)

    # Nystrom factor from leverage-ish random columns (prototype: plain
    # uniform columns; the production build uses leverage scores).
    rng = np.random.default_rng(0)
    cols = np.sort(rng.choice(n, k_pts * dim_i, replace=False))
    C = -K[:, cols]
    W = C[cols]
    Lw = np.linalg.cholesky(W + 1e-12 * np.eye(len(cols)))
    Y = np.linalg.solve(Lw, C.T)
    G = Y @ Y.T
    L = np.linalg.cholesky(G + lam * np.eye(len(cols)))
    F = np.linalg.solve(L, Y)  # (k, n)

    def minv_nys(r):
        return (r - F.T @ (F @ r)) / lam

    # Block-Jacobi of A: m diagonal (dim_i, dim_i) blocks.
    Binv = np.zeros((m, dim_i, dim_i))
    for i in range(m):
        blk = A[i * dim_i:(i + 1) * dim_i, i * dim_i:(i + 1) * dim_i]
        Binv[i] = np.linalg.inv(blk)

    def minv_bj(r):
        return np.einsum(
            'mij,mj->mi', Binv, r.reshape(m, dim_i)
        ).reshape(-1)

    def minv_nys_bj(r):
        # Symmetric two-level: top space via Woodbury, complement via
        # P B^-1 P^T with P = I - F^T F (PSD: sum of two PSD terms).
        Pr = r - F.T @ (F @ r)
        top = (r - Pr) / lam  # = F^T F r / lam
        w = minv_bj(Pr)
        return top + w - F.T @ (F @ w)

    # A-DEF2: Z = C (Nystrom columns), E = Z^T A Z.
    Z = C
    AZ = A @ Z
    E = Z.T @ AZ
    Einv = np.linalg.inv(E)

    def minv_adef2(r):
        zer = Z @ (Einv @ (Z.T @ r))
        pr = r - AZ @ (Einv @ (Z.T @ r))
        mpr = minv_bj(pr)
        return mpr - Z @ (Einv @ (AZ.T @ mpr)) + zer

    results = {}
    for name, Minv in [
        ('nys', minv_nys),
        ('bj', minv_bj),
        ('nys+bj', minv_nys_bj),
        ('adef2-bj', minv_adef2),
    ]:
        x, iters = pcg(A, b, Minv, tol=1e-4)
        resid = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
        results[name] = (iters, resid)
        print('%10s: %6d iters, rel resid %.2e' % (name, iters, resid),
              flush=True)
    base = results['nys'][0]
    for name, (iters, _) in results.items():
        print('%10s: %.2fx vs nys' % (name, base / max(iters, 1)))


if __name__ == '__main__':
    main()
