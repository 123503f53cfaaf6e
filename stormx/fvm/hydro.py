"""Ideal-gas (γ = 1.4) state transforms, vectorized over faces/cells.

Reference: ``Feathers/SkunkHydro.hpp:35-139`` (``MhdHydroVars``): conserved
vector U = (ρ, ρE, ρvx, ρvy, ρvz), primitive Q = (ρ, p, vx, vy, vz), flux
Fₙ = (ρvₙ, ρHvₙ, ρv vₙ + p n).  The per-state C++ object becomes a batch of
arrays — every face/cell state is converted at once on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["GAMMA", "GasState", "state_from_cons", "state_from_prim", "NUM_VARS"]

GAMMA = 1.4
GAMMA1 = GAMMA - 1.0
NUM_VARS = 5


class GasState(NamedTuple):
    """Batched fluid state (each field shaped (..., ))."""

    rho: jnp.ndarray  # density ρ
    p: jnp.ndarray  # pressure
    vel: jnp.ndarray  # velocity (..., 3)
    vel_n: jnp.ndarray  # v·n
    eps: jnp.ndarray  # internal energy ε
    nrg: jnp.ndarray  # total energy E = ½v² + ε
    ent: jnp.ndarray  # enthalpy H = E + p/ρ
    c_snd: jnp.ndarray  # sound speed

    def make_cons(self):
        """U = (ρ, ρE, ρv) (SkunkHydro.hpp:75-86)."""
        return jnp.stack(
            [
                self.rho,
                self.rho * self.nrg,
                self.rho * self.vel[..., 0],
                self.rho * self.vel[..., 1],
                self.rho * self.vel[..., 2],
            ],
            axis=-1,
        )

    def make_flux(self, n):
        """Fₙ = (ρvₙ, ρHvₙ, ρv vₙ + p n) (SkunkHydro.hpp:88-101)."""
        rvn = self.rho * self.vel_n
        return jnp.stack(
            [
                rvn,
                rvn * self.ent,
                rvn * self.vel[..., 0] + self.p * n[..., 0],
                rvn * self.vel[..., 1] + self.p * n[..., 1],
                rvn * self.vel[..., 2] + self.p * n[..., 2],
            ],
            axis=-1,
        )


def _pad3(n):
    """Zero-pad a (..., 2) normal to (..., 3)."""
    if n.shape[-1] == 3:
        return n
    return jnp.concatenate([n, jnp.zeros(n.shape[:-1] + (1,), n.dtype)], axis=-1)


def state_from_cons(n, cons) -> GasState:
    """(SkunkHydro.hpp:105-117): ρ = U₀, E = U₁/ρ, v = U₂:₅/ρ, p = (γ−1)ρε."""
    n = _pad3(n)
    rho = cons[..., 0]
    nrg = cons[..., 1] / rho
    vel = cons[..., 2:5] / rho[..., None]
    vel_n = jnp.einsum("...i,...i->...", vel, n)
    eps = nrg - 0.5 * jnp.einsum("...i,...i->...", vel, vel)
    p = GAMMA1 * rho * eps
    ent = nrg + p / rho
    c_snd = jnp.sqrt(GAMMA * p / rho)
    return GasState(rho, p, vel, vel_n, eps, nrg, ent, c_snd)


def state_from_prim(n, prim) -> GasState:
    """(SkunkHydro.hpp:118-128): Q = (ρ, p, v)."""
    n = _pad3(n)
    rho = prim[..., 0]
    p = prim[..., 1]
    vel = prim[..., 2:5]
    vel_n = jnp.einsum("...i,...i->...", vel, n)
    eps = p / rho / GAMMA1
    nrg = eps + 0.5 * jnp.einsum("...i,...i->...", vel, vel)
    ent = nrg + p / rho
    c_snd = jnp.sqrt(GAMMA * p / rho)
    return GasState(rho, p, vel, vel_n, eps, nrg, ent, c_snd)
