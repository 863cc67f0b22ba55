"""TPU-native molecular dynamics on trained (s)GDML models.

The reference drives MD through ASE's Python step loop, crossing
host<->model once per step (sgdml/intf/ase_calc.py:93-106). Here the
*entire trajectory* runs on device: the force field is a pure jitted
function, and the integrator is a ``lax.scan`` over time steps — zero
host traffic until the trajectory (or a snapshot stride) comes back.

Integrators: velocity Verlet (NVE) and Langevin (NVT, BAOAB splitting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ops import descriptor as desc_ops
from .predict import build_tables, predict_from_tables
from .train import desc_perm_table

__all__ = ['MDEngine']


class MDEngine:
    """On-device MD over a trained model dict.

    Parameters
    ----------
    model: model dict (reference-compatible npz layout).
    masses: ``(N,)`` atomic masses in u. Defaults to the standard atomic
        weights of the model's elements (``model['z']``) — the same
        convention as the reference's ASE-driven MD
        (sgdml/intf/ase_calc.py:93-106), so trajectories are physical out
        of the box. Pass explicit masses for isotopes or custom units.
    dtype: computation dtype (f64 default).
    """

    def __init__(self, model, masses=None, dtype=jnp.float64):
        from .models.gdml import as_model_dict

        model = as_model_dict(model)
        if masses is None:
            from .utils.io import ATOMIC_MASSES

            masses = ATOMIC_MASSES[np.asarray(model['z'], dtype=np.int64)]
        self.n_atoms = int(model['z'].shape[0])
        self.sig = float(np.squeeze(model['sig']))
        self.std = float(np.squeeze(model.get('std', 1.0)))
        self.c = float(np.squeeze(model.get('c', 0.0)))
        dperms = desc_perm_table(np.asarray(model['perms']))
        R_desc = jnp.asarray(np.asarray(model['R_desc']).T, dtype=dtype)
        R_d_desc_alpha = jnp.asarray(model['R_d_desc_alpha'], dtype=dtype)
        self.Xt, self.JA = build_tables(R_desc, R_d_desc_alpha, dperms)
        self.masses = jnp.asarray(masses, dtype=dtype)
        self.dtype = dtype

    def energy_forces(self, r):
        """(E, F(N,3)) for a single geometry ``r (N, 3)``."""
        x, jc = desc_ops.descriptor_jacobian(r.reshape(-1), self.n_atoms)
        E, F = predict_from_tables(
            x[None], jc[None], self.Xt, self.JA, None,
            self.sig, self.std, self.c, n_atoms=self.n_atoms,
        )
        return E[0], F[0].reshape(self.n_atoms, 3)

    @functools.partial(jax.jit, static_argnames=('self', 'n_steps', 'snapshot_every'))
    def _run_nve(self, r0, v0, dt, n_steps, snapshot_every):
        inv_m = 1.0 / self.masses[:, None]

        def step(carry, _):
            r, v, f = carry

            def substep(c2, _):
                r, v, f = c2
                v_half = v + 0.5 * dt * f * inv_m
                r = r + dt * v_half
                _, f = self.energy_forces(r)
                v = v_half + 0.5 * dt * f * inv_m
                return (r, v, f), None

            (r, v, f), _ = jax.lax.scan(substep, (r, v, f), None, length=snapshot_every)
            E, _ = self.energy_forces(r)
            ke = 0.5 * jnp.sum(self.masses[:, None] * v * v)
            return (r, v, f), (r, v, E, ke)

        _, f0 = self.energy_forces(r0)
        n_snap = n_steps // snapshot_every
        (_, _, _), traj = jax.lax.scan(
            step, (r0, v0, f0), None, length=n_snap
        )
        return traj

    def run_nve(self, r0, v0, dt, n_steps, snapshot_every: int = 1):
        """NVE (velocity Verlet). Returns (R (S,N,3), V, E_pot (S,), E_kin)."""
        r0 = jnp.asarray(np.asarray(r0).reshape(self.n_atoms, 3), dtype=self.dtype)
        v0 = jnp.asarray(np.asarray(v0).reshape(self.n_atoms, 3), dtype=self.dtype)
        R, V, E, KE = self._run_nve(r0, v0, dt, n_steps, snapshot_every)
        return np.asarray(R), np.asarray(V), np.asarray(E), np.asarray(KE)

    @functools.partial(
        jax.jit, static_argnames=('self', 'n_steps', 'snapshot_every')
    )
    def _run_langevin(self, r0, v0, dt, friction, kT, key, n_steps, snapshot_every):
        inv_m = 1.0 / self.masses[:, None]
        c1 = jnp.exp(-friction * dt)
        sigma_v = jnp.sqrt(kT * (1 - c1**2) / self.masses)[:, None]

        def step(carry, _):
            r, v, f, key = carry

            def substep(c2, _):
                r, v, f, key = c2
                v = v + 0.5 * dt * f * inv_m
                r = r + 0.5 * dt * v
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, r.shape, dtype=r.dtype)
                v = c1 * v + sigma_v * noise
                r = r + 0.5 * dt * v
                _, f = self.energy_forces(r)
                v = v + 0.5 * dt * f * inv_m
                return (r, v, f, key), None

            (r, v, f, key), _ = jax.lax.scan(
                substep, (r, v, f, key), None, length=snapshot_every
            )
            E, _ = self.energy_forces(r)
            ke = 0.5 * jnp.sum(self.masses[:, None] * v * v)
            return (r, v, f, key), (r, v, E, ke)

        _, f0 = self.energy_forces(r0)
        n_snap = n_steps // snapshot_every
        _, traj = jax.lax.scan(step, (r0, v0, f0, key), None, length=n_snap)
        return traj

    def run_langevin(
        self, r0, v0, dt, n_steps, friction=0.01, kT=0.1, seed=0,
        snapshot_every: int = 1,
    ):
        """Langevin (BAOAB) thermostatted dynamics on device."""
        r0 = jnp.asarray(np.asarray(r0).reshape(self.n_atoms, 3), dtype=self.dtype)
        v0 = jnp.asarray(np.asarray(v0).reshape(self.n_atoms, 3), dtype=self.dtype)
        key = jax.random.PRNGKey(seed)
        R, V, E, KE = self._run_langevin(
            r0, v0, dt, friction, kT, key, n_steps, snapshot_every
        )
        return np.asarray(R), np.asarray(V), np.asarray(E), np.asarray(KE)
