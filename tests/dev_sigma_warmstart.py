"""Dev measurement: does warm-starting CG across a sigma grid cut the
total iteration count? (VERDICT r4 item #7, the cross-solve recycling
lever: the `all` workflow re-solves neighboring sigma systems from
scratch in both the reference and this framework.)

Runs the same sigma grid twice with the iterative solver — cold starts
vs warm starts (each solve seeded with the previous sigma's converged
coefficients) — and prints per-sigma and total iterations.

MEASURED (bench_out/sigma_warmstart_r5b.log, m=200 / 5-sigma grid,
0.75 GB budget, all 10 solves converged): cold 5587 total iterations,
warm 5260 — **1.06x**. Below the >=1.3x gate for claiming the
VERDICT-r4 #7 iteration-count lever (Krylov recycling/deflation stays
parked, unlanded); but the warm start is never worse than cold (the
solver falls back cold on any split/shape mismatch), so the CLI
wiring lands as a small free default win.

Runs on CPU f64 deliberately: the measurement is algorithmic (Krylov
recycling effectiveness, a ratio of iteration counts), and this
synthetic shape at lam=1e-10 conditions to ~2e11 — reference-grade f64
converges (k=18, ~2.1k iters at sig=6) where the TPU's emulated-f64
matvec makes zero progress from iteration 0 (measured: best residual
pinned at ||b|| for 3k+ iters; BENCH_NOTES r5).
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np


def main():
    import jax.numpy as jnp

    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.ops.descriptor import descriptor_batch, descriptor_dim
    from sgdml_tpu.solvers.iterative import Iterative
    from sgdml_tpu.train import GDMLTrain

    n_atoms, m = 9, 200
    sigs = [6.0, 8.0, 10.0, 12.0, 15.0]
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 100, seed=3)
    trainer = GDMLTrain()
    np.random.seed(1)
    base_task = trainer.create_task(
        ds, m, ds, 50, sig=sigs[0], lam=1e-10, use_sym=False, use_E=True
    )
    R = base_task['R_train'].reshape(m, -1)
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange(descriptor_dim(n_atoms))[None, :]
    y = base_task['F_train'].ravel()
    y_std = float(np.std(y))

    # Small budget so the preconditioner is genuinely weak (k << m) and
    # iteration counts are in a regime where recycling can matter.
    mem_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1

    def run(warm):
        total = 0
        prev = None
        per = []
        for sig in sigs:
            task = dict(base_task)
            task['sig'] = sig
            if warm and prev is not None:
                task['alphas0_F'] = prev
            solver = Iterative(trainer, max_memory=mem_gb)
            out = solver.solve(
                task, np.asarray(X), np.asarray(Jc), dperms, y / y_std,
                y_std,
            )
            alphas, _, iters, resid, _, _, conv = out
            per.append((sig, iters, conv))
            total += iters
            # alphas0_F stores alphas (solve maps x0 = -alphas0_F and
            # returns alphas = -x), so pass the previous alphas as-is.
            prev = np.asarray(alphas)
            print('sig=%5.1f: %5d iters conv=%s' % (sig, iters, conv),
                  flush=True)
        return total, per

    print('--- cold starts ---')
    tot_cold, _ = run(False)
    print('--- warm starts ---')
    tot_warm, _ = run(True)
    print('total cold=%d warm=%d ratio=%.2fx'
          % (tot_cold, tot_warm, tot_cold / max(tot_warm, 1)))


if __name__ == '__main__':
    main()
