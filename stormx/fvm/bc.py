"""Boundary conditions: ghost-state construction per labeled face group.

Reference: ``Feathers/SkunkFvBC.hpp:40-141`` — FarField (copy), NoSlip
(velocity replaced/negated), Slip (normal component removed).  The virtual
``_get_ghost_state`` per face becomes one vectorized transform per boundary
label group (labels partition faces contiguously, so each group is a static
slice under jit).
"""

from __future__ import annotations

import jax.numpy as jnp

from stormx.fvm.hydro import state_from_cons

__all__ = ["far_field_bc", "no_slip_bc", "slip_bc"]


def far_field_bc(n, r, cons):
    """Ghost = interior state (SkunkFvBC.hpp:71-90)."""
    return cons


def no_slip_bc(n, r, cons, vel_fn=None):
    """Ghost velocity ← 0 (or prescribed v(r)) (SkunkFvBC.hpp:92-120)."""
    st = state_from_cons(n, cons)
    vel = vel_fn(r) if vel_fn is not None else jnp.zeros_like(st.vel)
    st = st._replace(vel=vel, vel_n=jnp.zeros_like(st.vel_n))
    # Re-derive total energy with the new velocity? The reference mutates only
    # `vel` and re-emits conserved vars from (rho, nrg, vel) via make_cons —
    # nrg is *kept*, so we mirror that exactly.
    return st.make_cons()


def slip_bc(n, r, cons):
    """Ghost velocity ← v − vₙ·n (SkunkFvBC.hpp:122-141)."""
    st = state_from_cons(n, cons)
    n3 = _pad(n)
    vel = st.vel - st.vel_n[..., None] * n3
    st = st._replace(vel=vel, vel_n=jnp.zeros_like(st.vel_n))
    return st.make_cons()


def _pad(n):
    if n.shape[-1] == 3:
        return n
    return jnp.concatenate([n, jnp.zeros(n.shape[:-1] + (1,), n.dtype)], axis=-1)
