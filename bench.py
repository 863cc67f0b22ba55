"""Benchmark: train + bulk inference on the synthetic ethanol-sized system.

Mirrors BASELINE.md configs 1 and 2: analytic training at M=200 and bulk
energy/force prediction over 10k geometries (N=9 atoms). The baseline
numbers in BENCH_BASELINE.json were measured by running the *reference*
implementation (NumPy path + its process auto-tuner) on this machine —
see tests/measure_reference_baseline.py.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import pathlib
import sys
import timeit

import numpy as np

ROOT = pathlib.Path(__file__).parent
sys.path.insert(0, str(ROOT))


def main():
    import jax
    import jax.numpy as jnp

    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.predict import GDMLPredict
    from sgdml_tpu.train import GDMLTrain

    baseline = {}
    baseline_path = ROOT / 'BENCH_BASELINE.json'
    if baseline_path.exists():
        baseline = json.loads(baseline_path.read_text())

    n_atoms, m_train, n_bulk = 9, 200, 10000
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=12000, seed=0)

    trainer = GDMLTrain()
    np.random.seed(1)
    task = trainer.create_task(
        ds, m_train, ds, 500, sig=10.0, lam=1e-10, use_sym=False, use_E=True
    )
    # Warm-up: first call pays XLA compilation (cached to disk thereafter)
    # plus tunnel startup latency; report the min-of-3 steady-state
    # training time (comparable to the reference's interpreter-free NumPy
    # path) alongside the cold time, so single-run tunnel noise cannot
    # drift the recorded number (BENCH_r02 regressed 1.01->1.46 s on
    # startup noise alone).
    t0 = timeit.default_timer()
    model = trainer.train(task, solver='analytic')
    t_train_cold = timeit.default_timer() - t0
    t_train = float('inf')
    for _ in range(3):
        t0 = timeit.default_timer()
        model = trainer.train(task, solver='analytic')
        t_train = min(t_train, timeit.default_timer() - t0)

    # Accuracy parity check on 1000 held-out geometries.
    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:1000]
    R_test = ds['R'][ti].reshape(len(ti), -1)
    f_ref = ds['F'][ti].reshape(len(ti), -1)

    def measure(dtype, transfer_dtype=None):
        # Accuracy at a 1k bucket; throughput at a single 10k launch (the
        # contraction is launch/transfer-bound at this molecule size — one
        # big XLA program with narrow transfers is the fast path).
        pred = GDMLPredict(
            model, dtype=dtype, batch_size=1000, transfer_dtype=transfer_dtype
        )
        E, F = pred.predict(R_test)
        f_mae = float(np.abs(F - f_ref).mean())
        e_mae = float(np.abs(E - ds['E'][ti]).mean())

        pred = GDMLPredict(
            model, dtype=dtype, batch_size=n_bulk, transfer_dtype=transfer_dtype
        )
        R_bulk = ds['R'][:n_bulk].reshape(n_bulk, -1)
        pred.predict(R_bulk)  # warm-up compile
        dt = float('inf')
        for _ in range(3):
            t0 = timeit.default_timer()
            pred.predict(R_bulk)
            dt = min(dt, timeit.default_timer() - t0)
        return n_bulk / dt, f_mae, e_mae

    gps64, f_mae64, e_mae64 = measure(jnp.float64)
    gps64t32, f_mae64t32, e_mae64t32 = measure(
        jnp.float64, transfer_dtype=jnp.float32
    )
    gps32, f_mae32, e_mae32 = measure(jnp.float32)

    # Environment calibration: the serving path is transfer/launch-bound
    # through the device link (BENCH_NOTES.md), so record the raw
    # round-trip time of the SAME transfer volume as one timed predict
    # (R up: B x 3N f32; [F | E] down: B x (3N+1) f32) through a trivial
    # jitted program. `n_bulk / tunnel_roundtrip_s` is the throughput
    # ceiling the link allows on THIS run — it lets a reader separate
    # link-latency drift (observed at +-40% between rounds) from code
    # regressions.
    x_up = np.ones((n_bulk, 3 * n_atoms), np.float32)
    triv = jax.jit(
        lambda a: jnp.concatenate([a * 2.0, a[:, :1]], axis=1)
    )
    np.asarray(triv(jnp.asarray(x_up)))  # warm-up compile
    rt = float('inf')
    for _ in range(5):
        t0 = timeit.default_timer()
        np.asarray(triv(jnp.asarray(x_up)))
        rt = min(rt, timeit.default_timer() - t0)

    # Device-only serving throughput (VERDICT r3 item #5): the headline
    # gps swings +-40% with tunnel link state, which can mask compute
    # regressions. Dispatch K repetitions of the SAME bucket program with
    # the input already resident on device and no per-iteration fetch
    # (TPU executes one program at a time per core, so the final scalar
    # fetch syncs the whole chain); slope timing between two K values
    # cancels the single round trip and the dispatch overheads — what
    # remains is pure on-device compute time per bucket.
    from sgdml_tpu import predict as predict_mod

    pred_dev = GDMLPredict(
        model, dtype=jnp.float64, batch_size=n_bulk,
        transfer_dtype=jnp.float32,
    )
    Rb_dev = jnp.asarray(
        ds['R'][:n_bulk].reshape(n_bulk, -1), dtype=jnp.float32
    )

    def _run_chain(reps):
        out = None
        for _ in range(reps):
            out = predict_mod._predict_geoms(
                Rb_dev, pred_dev.Xt, pred_dev.JA, pred_dev.alphas_E_lin,
                None, None, pred_dev.sig, pred_dev.std, pred_dev.c,
                n_atoms=pred_dev.n_atoms, out_dtype='float32',
            )
        np.asarray(out[0, 0])  # one scalar fetch syncs the chain

    def slope_time(run_chain, batch):
        """Per-batch device time from slope timing between two chain
        lengths (cancels the single fetch round trip + dispatch)."""
        run_chain(1)  # warm-up compile
        k1, k2 = 2, 8
        t_k1 = t_k2 = float('inf')
        for _ in range(3):
            t0 = timeit.default_timer()
            run_chain(k1)
            t_k1 = min(t_k1, timeit.default_timer() - t0)
            t0 = timeit.default_timer()
            run_chain(k2)
            t_k2 = min(t_k2, timeit.default_timer() - t0)
        per_rep = max((t_k2 - t_k1) / (k2 - k1), 1e-9)
        return batch / per_rep

    gps_device = slope_time(_run_chain, n_bulk)
    # MFU of the five-matmul contraction at f64 (the serving compute
    # path): ~10*T*D flops per geometry over the (B, D) x (D, T=M*P)
    # contractions, against the measured 2.0 TFLOP/s emulated-f64 matmul
    # peak of this chip (BENCH_NOTES round 2).
    T_tab, D_dim = pred_dev.Xt.shape
    mfu_f64 = (10.0 * T_tab * D_dim * gps_device) / 2.0e12

    # MD22-shape device-only serving (VERDICT r4 item #4): the table
    # shape where serving is COMPUTE-bound (N=60, T=M*P=3000, D=1770,
    # B=512 — vs the (B, 36)-thin ethanol contraction whose MFU is
    # launch/shape-limited). Synthetic descriptor-scale tables: the
    # contraction cost is value-independent, so this measures the real
    # MD22-class compute path without a 3000-point training run inside
    # the driver's bench budget. Driver-captured here so the 42.6%-MFU
    # claim (BENCH_NOTES r4) regresses visibly round-over-round.
    n_at22, T22, B22 = 60, 3000, 512
    D22 = n_at22 * (n_at22 - 1) // 2
    rng22 = np.random.default_rng(7)
    R22 = jnp.asarray(
        rng22.normal(size=(B22, 3 * n_at22)) * 3.0, dtype=jnp.float32
    )
    Xt22 = jnp.asarray(0.3 + rng22.random((T22, D22)))
    JA22 = jnp.asarray(rng22.normal(size=(T22, D22)) * 1e-2)

    def _run_chain_md22(reps):
        out = None
        for _ in range(reps):
            out = predict_mod._predict_geoms(
                R22, Xt22, JA22, None, None, None, 10.0, 1.0, 0.0,
                n_atoms=n_at22, out_dtype='float32',
            )
        np.asarray(out[0, 0])

    gps_device_md22 = slope_time(_run_chain_md22, B22)
    mfu_md22 = (10.0 * T22 * D22 * gps_device_md22) / 2.0e12

    # Headline: fastest config whose force MAE stays within 1e-3 of the
    # all-f64 path (f64 compute with f32 transfers qualifies; pure f32
    # compute usually does not — GDML coefficients cancel heavily).
    candidates = [
        (gps64, f_mae64, e_mae64, 'float64'),
        (gps64t32, f_mae64t32, e_mae64t32, 'float64 compute, float32 transfer'),
        (gps32, f_mae32, e_mae32, 'float32'),
    ]
    eligible = [c for c in candidates if c[1] <= f_mae64 + 1e-3]
    gps, f_mae, e_mae, dtype = max(eligible, key=lambda c: c[0])

    base_gps = baseline.get('reference_pred_geoms_per_sec', None)
    result = {
        'metric': 'bulk inference throughput (ethanol-sized N=9, M=200, 10k geoms)',
        'value': round(gps, 1),
        'unit': 'geoms/sec',
        'vs_baseline': round(gps / base_gps, 2) if base_gps else None,
        'extra': {
            'device': str(jax.devices()[0]),
            'dtype': dtype,
            'train_s': round(t_train, 2),
            'train_s_cold': round(t_train_cold, 2),
            'train_s_vs_baseline': (
                round(baseline['reference_train_s'] / t_train, 2)
                if 'reference_train_s' in baseline
                else None
            ),
            'force_mae': round(f_mae, 5),
            'force_mae_reference': baseline.get('reference_force_mae'),
            'energy_mae': round(e_mae, 5),
            'gps_float64': round(gps64, 1),
            'gps_f64_compute_f32_transfer': round(gps64t32, 1),
            'gps_float32': round(gps32, 1),
            'tunnel_roundtrip_s': round(rt, 4),
            'tunnel_bound_gps': round(n_bulk / rt, 1),
            # Achieved/ceiling: the headline gps relative to what the
            # link allows on THIS run — the round-over-round STABLE
            # quantity (the raw gps swings +-40% with tunnel state).
            # Can exceed 1: the ceiling is a single trivial-program
            # round trip (min of 5) and the real predict overlaps its
            # up-transfer with compute, so a slow calibration moment
            # on a jittery link undershoots the true ceiling.
            'achieved_over_ceiling': round(gps / (n_bulk / rt), 3),
            'gps_device_only': round(gps_device, 1),
            'mfu_f64_pct': round(100.0 * mfu_f64, 2),
            # MD22-shape (N=60, T=3000, D=1770, B=512) device-only
            # serving: the compute-bound regime where MFU is the honest
            # efficiency number.
            'gps_device_only_md22': round(gps_device_md22, 1),
            'mfu_md22_pct': round(100.0 * mfu_md22, 2),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
