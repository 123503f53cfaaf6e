"""Numerical flux schemes, vectorized over all faces at once.

Reference: ``Feathers/FluxScheme.hpp:43-79`` — Lax–Friedrichs (Rusanov):
F = ½[(F_r + F_l) − s·(U_r − U_l)], s = max(|vₙ| + c).  (HLL/HLLC exist in
the reference but are ``#if 0``-ed; HLL is implemented here as the natural
next scheme for the same interface.)
"""

from __future__ import annotations

import jax.numpy as jnp

from stormx.fvm.hydro import state_from_cons

__all__ = ["lax_friedrichs_flux", "hll_flux"]


def lax_friedrichs_flux(n, cons_r, cons_l):
    """Rusanov flux over batched faces (FluxScheme.hpp:56-78).

    Argument order matches the reference call sites: r = outer, l = inner.
    """
    ur = state_from_cons(n, cons_r)
    ul = state_from_cons(n, cons_l)
    ss = jnp.maximum(jnp.abs(ur.vel_n) + ur.c_snd, jnp.abs(ul.vel_n) + ul.c_snd)
    flux_r = ur.make_flux(_pad(n))
    flux_l = ul.make_flux(_pad(n))
    return 0.5 * ((flux_r + flux_l) - ss[..., None] * (cons_r - cons_l))


def hll_flux(n, cons_r, cons_l):
    """HLL flux (Harten–Lax–van Leer) — the reference's dormant scheme
    (FluxScheme.hpp:81-160, ``#if 0``), implemented live here."""
    ur = state_from_cons(n, cons_r)
    ul = state_from_cons(n, cons_l)
    s_l = jnp.minimum(ul.vel_n - ul.c_snd, ur.vel_n - ur.c_snd)
    s_r = jnp.maximum(ul.vel_n + ul.c_snd, ur.vel_n + ur.c_snd)
    f_l = ul.make_flux(_pad(n))
    f_r = ur.make_flux(_pad(n))
    sl = s_l[..., None]
    sr = s_r[..., None]
    f_star = (sr * f_l - sl * f_r + sl * sr * (cons_r - cons_l)) / (sr - sl)
    return jnp.where(sl >= 0, f_l, jnp.where(sr <= 0, f_r, f_star))


def _pad(n):
    if n.shape[-1] == 3:
        return n
    return jnp.concatenate([n, jnp.zeros(n.shape[:-1] + (1,), n.dtype)], axis=-1)
