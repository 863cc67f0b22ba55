"""GDML inference engine: batched energy/force prediction on TPU.

Every prediction is a linear combination over ``T = M * P`` kernel terms
(M training points x P symmetry permutations). The reference evaluates it
with chunked per-geometry NumPy workers (sgdml/predict.py:84-245) or eager
torch ops (sgdml/torchtools.py:877-1047). Here the whole batch is one
jit-compiled XLA program built from five MXU matmuls:

    G   = Xq @ Xt^T                          (B, T)   query x table Gram
    a   = Xq @ JA^T - <Xt, JA>               (B, T)   d . (J alpha) terms
    F_d = rowsum(w1) * Xq - w1 @ Xt - w2 @ JA  (B, D) descriptor-space force
    E   = rowsum(a * w2)                     (B,)

with elementwise coefficient planes ``w1, w2`` from the Matern-5/2 family.
The ``(B, T, D)`` difference tensor of the reference formulation is never
materialized; squared distances come from the Gram identity
``u^2 = |x|^2 - 2 x.t + |t|^2`` (exact enough in f64; f32 fast path uses the
same route and is validated in tests). Cartesian forces are recovered
through the incidence-factorized Jacobian transpose (one more matmul).

The same code path serves (a) bulk inference, (b) the ASE calculator, and
(c) the iterative solver's matrix-free CG matvec (predict-all-training-
points; reference sgdml/solvers/iterative.py:183-206) — the reference
implements this contraction four separate times, this framework exactly
once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ops import descriptor as desc_ops
from .ops.kernel import Mat52Coeffs

__all__ = ['GDMLPredict', 'build_tables', 'predict_from_tables']

_SQRT5 = np.sqrt(5.0)


def build_tables(R_desc, R_d_desc_alpha, desc_perms):
    """Flatten permuted training tables.

    Parameters
    ----------
    R_desc: ``(M, D)`` training descriptors.
    R_d_desc_alpha: ``(M, D)`` alpha-contracted training Jacobians
        (``J_m^T``-free form; reference model key ``R_d_desc_alpha``).
    desc_perms: ``(P, D)`` descriptor permutations.

    Returns
    -------
    Xt, JA: ``(M*P, D)`` permuted tables, laid out ``t = m * P + p``
        (reference layout, sgdml/predict.py:426-441).
    """
    dp = jnp.asarray(np.asarray(desc_perms))
    Xt = R_desc[:, dp].reshape(-1, R_desc.shape[1])
    JA = R_d_desc_alpha[:, dp].reshape(-1, R_desc.shape[1])
    return Xt, JA


@functools.partial(jax.jit, static_argnames=('n_atoms', 'with_forces', 'mm'))
def predict_from_tables(
    Xq,
    Jcq,
    Xt,
    JA,
    alphas_E_lin,
    sig,
    std,
    c,
    *,
    n_atoms: int,
    with_forces: bool = True,
    mm: str = 'native',
):
    """Batched (E, F) prediction from flattened permuted tables.

    Xq: ``(B, D)`` query descriptors. Jcq: ``(B, D, 3)`` query compressed
    Jacobians. Xt/JA: ``(T, D)`` tables. alphas_E_lin: ``(T,)`` permuted
    energy coefficients or None. Returns ``E (B,)`` and ``F (B, 3N)``.

    ``mm='ozaki'``: run the four O(B*T*D) matmuls as Ozaki int8-MXU GEMMs
    (6 slices, ~36-bit operands — truncation ~1e-11 of the row scales,
    and ~6x the emulated-f64 matmul rate on TPU); ``mm='ozaki<N>'``
    selects N mantissa slices. The matvec truncation sets a CG residual
    floor of ~||b|| * 2^(-6N) * kappa (inexact-Krylov stagnation;
    measured at MD22 M=3000: floor 12 on ||b||=735 at 6 slices with
    kappa ~ 1e9), so the iterative solver escalates N when its best
    residual stops improving. The elementwise kernel coefficients stay
    f64. Falls back to native dots when a contraction dimension exceeds
    the exact-int32 bound.
    """
    if Xq.dtype == jnp.float32:
        # True-f32 products: TPU default-precision f32 matmuls use bf16
        # passes (~1e-3 relative), which would erase the accuracy the
        # centered Gram form buys. HIGHEST costs ~6x matmul passes but the
        # f32 path is still ~15x faster than emulated f64.
        with jax.default_matmul_precision('highest'):
            return _predict_from_tables_body(
                Xq, Jcq, Xt, JA, alphas_E_lin, sig, std, c,
                n_atoms=n_atoms, with_forces=with_forces,
            )
    return _predict_from_tables_body(
        Xq, Jcq, Xt, JA, alphas_E_lin, sig, std, c,
        n_atoms=n_atoms, with_forces=with_forces, mm=mm,
    )


def _ozaki_nt(a, bt, n_slices=6):
    """``a @ bt`` (bt already transposed, shape (k, n)) as an Ozaki int8
    GEMM over f64 operands split to (f32, f32) pairs."""
    from .ops.ozaki import ozaki_gemm_nt

    a_hi = a.astype(jnp.float32)
    a_lo = (a - a_hi.astype(jnp.float64)).astype(jnp.float32)
    b = bt.T
    b_hi = b.astype(jnp.float32)
    b_lo = (b - b_hi.astype(jnp.float64)).astype(jnp.float32)
    return ozaki_gemm_nt(a_hi, b_hi, lo_a=a_lo, lo_b=b_lo, n_slices=n_slices)


def _predict_from_tables_body(
    Xq, Jcq, Xt, JA, alphas_E_lin, sig, std, c, *, n_atoms, with_forces,
    mm='native',
):
    # mm='ozaki' runs the GEMMs on the int8 MXU at 6 mantissa slices;
    # 'ozaki<N>' (e.g. 'ozaki8') selects N slices — the CG matvec
    # escalates through these rungs when its residual floors out at the
    # current truncation level (solvers/iterative.py MV_MM_LADDER).
    ns = 6
    if mm.startswith('ozaki'):
        from .ops.ozaki import max_contraction_dim

        ns = int(mm[len('ozaki'):] or 6)
        if max(Xt.shape[0], Xt.shape[1]) > max_contraction_dim(ns):
            mm = 'native'  # contraction overflows exact int32; stay f64

    def mm_nt(a, bt):
        """a @ bt with bt pre-transposed (k, n)."""
        return _ozaki_nt(a, bt, ns) if mm.startswith('ozaki') else a @ bt

    sig = jnp.asarray(sig, dtype=Xq.dtype)

    # Center both sides on the table mean. Distances and differences are
    # translation-invariant, so this is exact math — but it shrinks the
    # magnitudes entering the Gram-identity cancellation from |x| to the
    # descriptor cloud's spread around its mean, which is what makes the
    # f32 fast path accurate (the raw Gram identity loses ~eps*|x|^2/u^2
    # relative accuracy for nearby geometries).
    mu = jnp.mean(Xt, axis=0)
    Xq = Xq - mu[None, :]
    Xt = Xt - mu[None, :]

    xq_sq = jnp.sum(Xq * Xq, axis=1)  # (B,)
    xt_sq = jnp.sum(Xt * Xt, axis=1)  # (T,)
    gram = mm_nt(Xq, Xt.T)  # (B, T) MXU
    u2 = jnp.maximum(xq_sq[:, None] - 2.0 * gram + xt_sq[None, :], 0.0)
    u5 = _SQRT5 * jnp.sqrt(u2)

    e = jnp.exp(-u5 / sig)
    b1 = (5.0 / (3.0 * sig**3)) * e  # gradient-kernel base
    w2 = b1 * (u5 + sig)

    tja = jnp.sum(Xt * JA, axis=1)  # (T,)
    a = mm_nt(Xq, JA.T) - tja[None, :]  # (B, T): d.(J alpha), centering-inv.

    E = jnp.sum(a * w2, axis=1)

    if alphas_E_lin is not None:
        k_ee = Mat52Coeffs.value(u5, sig)
        E = E + k_ee @ alphas_E_lin

    if not with_forces:
        return E * std + c, None

    w1 = a * b1 * (5.0 / sig)
    F_d = jnp.sum(w1, axis=1)[:, None] * Xq - mm_nt(w1, Xt)  # (B, D)
    F_d = F_d - mm_nt(w2, JA)

    if alphas_E_lin is not None:
        w3 = w2 * alphas_E_lin[None, :]
        F_d = F_d + jnp.sum(w3, axis=1)[:, None] * Xq - mm_nt(w3, Xt)

    F = desc_ops.vec_dot_jac(Jcq, F_d, n_atoms) * std
    return E * std + c, F


@functools.partial(
    jax.jit, static_argnames=('n_atoms', 'with_forces', 'out_dtype')
)
def _predict_geoms(
    R, Xt, JA, alphas_E_lin, lat, lat_inv, sig, std, c,
    *, n_atoms, with_forces=True, out_dtype=None,
):
    """Fused descriptor + prediction for one fixed-size geometry bucket.

    One compiled program serves any input size (the host loops over
    fixed-size buckets), which matters on TPU where each new program shape
    costs a fresh XLA compile.

    ``R`` may arrive in a narrower *transfer* dtype (f32) than the compute
    dtype (taken from the tables); ``out_dtype`` narrows the results before
    the device-to-host transfer — bulk serving over a host link is
    transfer-bandwidth-bound, and coordinate/force f32 rounding (~1e-7
    relative) is far below model error.

    Returns ONE packed ``(B, 3N+1)`` array ``[F | E]`` (or ``(B, 1)`` when
    ``with_forces=False``): the serving link has high per-round-trip
    latency (~0.1 s through the measured tunnel), so fetching E and F as
    two separate device-to-host transfers costs a full extra round trip
    per bucket — packing makes each bucket exactly one fetch.
    """
    lat_and_inv = None if lat is None else (lat, lat_inv)
    R = R.astype(Xt.dtype)
    Xq, Jcq = desc_ops.descriptor_batch(R, n_atoms, lat_and_inv)
    E, F = predict_from_tables(
        Xq, Jcq, Xt, JA, alphas_E_lin, sig, std, c,
        n_atoms=n_atoms, with_forces=with_forces,
    )
    if out_dtype is not None:
        E = E.astype(out_dtype)
        F = F if F is None else F.astype(out_dtype)
    if not with_forces:
        return E[:, None]
    return jnp.concatenate([F, E[:, None]], axis=1)


def _auto_batch_size() -> int:
    """Device-dependent default bucket (ROADMAP: fold the measured
    tune.py ladder into the defaults). On the TPU the serving path is
    launch/transfer-bound — one 10k-geometry launch measured 56k
    geoms/s where 20 x 500 launches gave 7.8k (BENCH_NOTES.md) — so
    accelerators default to a large bucket; small requests still take
    the power-of-two ladder below it (see ``_bucket``). CPU keeps a
    small bucket (compile cost dominates there, throughput does not).
    ``prepare_parallel`` / the tune cache override this default."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - backend init failure
        platform = 'cpu'
    return 64 if platform == 'cpu' else 1024


def _desc_perm_table(perms: np.ndarray) -> np.ndarray:
    return np.stack([desc_ops.perm_to_desc_perm(p) for p in np.asarray(perms)])


class GDMLPredict:
    """Load a trained (s)GDML model and predict energies and forces.

    Accepts model dicts in the reference's npz layout
    (sgdml/train.py:793-831) or this framework's (identical keys).

    Parameters
    ----------
    model: model dict.
    dtype: computation dtype for inference (float64 default for parity;
        float32 is the TPU fast path).
    batch_size: static batch bucket; inputs are padded up to a multiple of
        it (one XLA compilation per bucket). Replaces the reference's
        process-pool auto-tuner (sgdml/predict.py:770-1042) — tuning
        disappears under XLA with static shapes.
    mesh: optional ``jax.sharding.Mesh`` for data-parallel serving: query
        batches are sharded over devices, tables replicated; GSPMD
        partitions the five-matmul program (the TPU-native replacement
        for the reference's multi-GPU DataParallel serving,
        sgdml/predict.py:376-378). Supports the full model class
        (energy constraints, lattice/PBC).
    """

    def __init__(self, model, dtype=jnp.float64, batch_size: int | None = None,
                 transfer_dtype=None, mesh=None):
        from .models.gdml import as_model_dict

        model = as_model_dict(model)
        if not _is_model(model):
            raise ValueError('The provided data structure is not a valid model.')

        self.n_atoms = int(model['z'].shape[0])
        self.dim_i = 3 * self.n_atoms
        self.dtype = dtype
        # Narrower host<->device transfer dtype (compute stays in `dtype`).
        self.transfer_dtype = transfer_dtype
        self.mesh = mesh
        self._n_dev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
        if batch_size is None:
            batch_size = _auto_batch_size()
        batch_size = -(-int(batch_size) // self._n_dev) * self._n_dev
        self.batch_size = int(batch_size)

        self.lat_and_inv = None
        if 'lattice' in model:
            lat = np.asarray(model['lattice'], dtype=np.float64)
            self.lat_and_inv = (
                jnp.asarray(lat, dtype=dtype),
                jnp.asarray(np.linalg.inv(lat), dtype=dtype),
            )

        self.sig = float(np.squeeze(model['sig']))
        self.std = float(np.squeeze(model.get('std', 1.0)))
        self.c = float(np.squeeze(model.get('c', 0.0)))

        perms = np.asarray(model['perms'])
        self.n_perms = perms.shape[0]
        self._desc_perms = _desc_perm_table(perms)

        # Reference stores descriptors transposed: R_desc is (D, M).
        R_desc = jnp.asarray(np.asarray(model['R_desc']).T, dtype=dtype)
        R_d_desc_alpha = jnp.asarray(model['R_d_desc_alpha'], dtype=dtype)
        self.n_train = R_desc.shape[0]

        self.Xt, self.JA = build_tables(R_desc, R_d_desc_alpha, self._desc_perms)

        self.alphas_E_lin = None
        if model.get('alphas_E') is not None and 'alphas_E' in model:
            aE = jnp.asarray(model['alphas_E'], dtype=dtype)
            self.alphas_E_lin = jnp.repeat(aE, self.n_perms)

        # Caches for iterative-training mode.
        self._R_desc_train = R_desc
        self._R_d_desc_train = None

        if mesh is not None:
            self.Xt = self._replicate(self.Xt)
            self.JA = self._replicate(self.JA)
            if self.alphas_E_lin is not None:
                self.alphas_E_lin = self._replicate(self.alphas_E_lin)
            if self.lat_and_inv is not None:
                self.lat_and_inv = tuple(
                    self._replicate(x) for x in self.lat_and_inv
                )

    # -- mesh helpers --------------------------------------------------------

    def _replicate(self, x):
        if self.mesh is None:
            return x
        from .parallel.spmd import replicate

        return replicate(x, self.mesh)

    def _shard(self, x):
        """Shard a (padded) query batch over the mesh's leading axis."""
        if self.mesh is None:
            return x
        from .parallel.spmd import shard_batch

        return shard_batch(x, self.mesh)

    # -- iterative-training hooks (reference: predict.py:510-601) ---------

    def set_R_desc(self, R_desc):
        self._R_desc_train = jnp.asarray(R_desc, dtype=self.dtype)
        self.Xt, _ = build_tables(self._R_desc_train, self._R_desc_train, self._desc_perms)
        self.Xt = self._replicate(self.Xt)

    def set_R_d_desc(self, R_d_desc):
        """Store training compressed Jacobians ``(M, D, 3)`` — required
        before :meth:`set_alphas`."""
        self._R_d_desc_train = jnp.asarray(R_d_desc, dtype=self.dtype)

    def set_alphas(self, alphas_F, alphas_E=None):
        """Re-derive the contracted tables from new regression coefficients
        (CG matvec hot path)."""
        assert self._R_d_desc_train is not None, 'call set_R_d_desc first'
        al = jnp.asarray(alphas_F, dtype=self.dtype).reshape(-1, self.dim_i)
        R_d_desc_alpha = desc_ops.jac_dot_vec(
            self._R_d_desc_train, al, self.n_atoms
        )
        _, self.JA = build_tables(
            self._R_desc_train, R_d_desc_alpha, self._desc_perms
        )
        self.JA = self._replicate(self.JA)
        if alphas_E is not None:
            self.alphas_E_lin = self._replicate(jnp.repeat(
                jnp.asarray(alphas_E, dtype=self.dtype), self.n_perms
            ))

    # -- main API ----------------------------------------------------------

    def _bucket(self, B: int) -> int:
        """Effective bucket for a request of B geometries: the configured
        bucket, or the next power of two below it for small inputs — at
        most log2(batch_size) distinct compiled programs, no full-bucket
        padding waste for single-geometry (MD) calls."""
        b = self.batch_size
        if B >= b:
            return b
        p = 1
        while p < B:
            p <<= 1
        # Buckets stay divisible by the device count on a mesh.
        p = -(-p // self._n_dev) * self._n_dev
        return min(p, b)

    def _pad(self, B: int) -> int:
        b = self._bucket(B)
        return -(-B // b) * b

    def predict(self, R=None, R_desc=None, R_d_desc=None, return_E=True):
        """Predict energies and forces.

        Parameters
        ----------
        R: ``(B, 3N)`` / ``(B, N, 3)`` / ``(3N,)`` Cartesian geometries, or
            None to predict on cached training descriptors (train mode).
        R_desc / R_d_desc: optionally pass precomputed descriptors.

        Returns
        -------
        (E (B,), F (B, 3N)) as NumPy arrays.
        """
        if R is None and R_desc is None:
            # Train mode: descriptors already cached on device.
            Xq = self._R_desc_train
            Jcq = self._R_d_desc_train
            E, F = predict_from_tables(
                Xq, Jcq, self.Xt, self.JA, self.alphas_E_lin,
                self.sig, self.std, self.c, n_atoms=self.n_atoms,
            )
            return (np.asarray(E), np.asarray(F)) if return_E else (
                None, np.asarray(F)
            )
        if R_desc is not None:
            Xq = jnp.asarray(R_desc, dtype=self.dtype)
            Jcq = jnp.asarray(R_d_desc, dtype=self.dtype)
            B = Xq.shape[0]
            Bp = self._pad(B)
            if Bp != B:
                Xq = jnp.pad(Xq, ((0, Bp - B), (0, 0)))
                Jcq = jnp.pad(Jcq, ((0, Bp - B), (0, 0), (0, 0)))
            Xq, Jcq = self._shard(Xq), self._shard(Jcq)
            E, F = predict_from_tables(
                Xq, Jcq, self.Xt, self.JA, self.alphas_E_lin,
                self.sig, self.std, self.c, n_atoms=self.n_atoms,
            )
            E, F = np.asarray(E[:B]), np.asarray(F[:B])
            return (E, F) if return_E else (None, F)

        # Geometry path: host loop over fixed-size buckets so that ONE
        # compiled program (descriptor + predictor fused) serves any size.
        R = np.asarray(R, dtype=np.float64)
        if R.ndim == 1:
            R = R[None, :]
        R = R.reshape(R.shape[0], -1)
        B = R.shape[0]
        bs = self._bucket(R.shape[0])
        Bp = self._pad(B)
        if Bp != B:
            R = np.concatenate([R, np.tile(R[-1:], (Bp - B, 1))], axis=0)

        lat, lat_inv = (None, None) if self.lat_and_inv is None else self.lat_and_inv
        # Dispatch every bucket asynchronously before synchronizing any —
        # XLA overlaps the host->device transfers with compute, which
        # matters when device dispatch has high latency.
        tdt = self.transfer_dtype
        out_dtype = None if tdt is None else np.dtype(tdt).name
        results = []
        for b0 in range(0, Bp, bs):
            Rb = jnp.asarray(R[b0 : b0 + bs], dtype=tdt or self.dtype)
            Rb = self._shard(Rb)
            results.append(
                _predict_geoms(
                    Rb, self.Xt, self.JA, self.alphas_E_lin, lat, lat_inv,
                    self.sig, self.std, self.c, n_atoms=self.n_atoms,
                    out_dtype=out_dtype,
                )
            )
        # One fetch per bucket: each result is the packed [F | E] array.
        packed = np.concatenate([np.asarray(r) for r in results])
        E_out, F_out = packed[:, -1], packed[:, :-1]
        return (E_out[:B], F_out[:B]) if return_E else (None, F_out[:B])

    def prepare_parallel(self, n_bulk: int = 1000, **kwargs):
        """Auto-tune the batch-bucket size for bulk throughput (API parity
        with the reference's process auto-tuner, sgdml/predict.py:770).
        Returns measured geometries/sec."""
        from .tune import prepare_parallel as _tune

        return _tune(self, n_bulk=n_bulk, **kwargs)

    def predict_train_forces(self, alphas_F, alphas_E=None):
        """CG matvec core: set coefficients, predict all training points.

        Returns the raveled force prediction ``(M * 3N,)`` (plus negated
        energies when energy constraints are active, matching the
        reference's matvec layout, sgdml/solvers/iterative.py:190-202).
        """
        self.set_alphas(alphas_F, alphas_E=alphas_E)
        E, F = self.predict()
        if alphas_E is not None:
            return np.hstack((np.asarray(F).ravel(), -np.asarray(E)))
        return np.asarray(F).ravel()


def _is_model(model) -> bool:
    t = model.get('type')
    if isinstance(t, bytes):
        t = t.decode()
    if isinstance(t, np.ndarray):
        t = str(np.squeeze(t))
    return t == 'm'
