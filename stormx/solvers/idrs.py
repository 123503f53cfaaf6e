"""IDR(s) — Induced Dimension Reduction (van Gijzen–Sonneveld, Algorithm 913).

Transcribed from ``Solvers/SolverIdrs.hpp:52-291``: inner-outer with
s = ``num_inner_iterations`` (default 4, ``:287-289``).  The shadow space is
built once at the first inner cycle with modified Gram–Schmidt over random
vectors (``:129-141``); the reference uses a default-seeded mt19937
(``Bittern/MatrixAlgorithms.hpp:139-153``) — here the RNG is ``jax.random``
with a pinned seed so runs are reproducible across processes and partitions.

All i-loops with data-dependent bounds (k = iteration % s) run over the
static range [0, s) with `jnp.where` masks, so the traced loop body is fixed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from stormx.ops import safe_divide
from stormx.ops import vector as v
from stormx.solvers.base import SolveResult, SolverOptions, resolve_side, run_iterative
from stormx.solvers.operator import as_operator
from stormx.solvers.preconditioner import PreconditionerSide, build_preconditioner

__all__ = ["idrs"]

_SHADOW_SEED = 20230815  # pinned shadow-space seed


def idrs(
    op,
    b,
    x0,
    *,
    precond=None,
    options: SolverOptions | None = None,
    s: int = 4,
    axis_name: str | None = None,
    shadow_seed: int = _SHADOW_SEED,
    shadow=None,
) -> SolveResult:
    """``shadow`` (optional): caller-supplied stacked raw vectors (s-1 leaves
    stacked on axis 0, same pytree as ``b``) used instead of ``jax.random``
    draws for p₁..p₋₁.  Distributed callers MUST supply these in global
    layout — device-local draws with a replicated key repeat the same tile
    on every device and make the basis depend on the partition count."""
    opts = options or SolverOptions()
    A = as_operator(op)
    P = build_preconditioner(precond, x0, b, A)
    side = resolve_side(opts.pre_side, precond=P, solver='idrs')
    left_pre = P is not None and side == PreconditionerSide.LEFT
    right_pre = P is not None and side == PreconditionerSide.RIGHT

    def dot(a, c):
        return v.dot(a, c, axis_name=axis_name)

    def norm(x):
        return v.norm_2(x, axis_name=axis_name)

    def init_fn(x):
        # r ← 𝓟?(b − 𝓐x); φ₀ ← ‖r‖ (:85-101).
        r = A.residual(b, x)
        if left_pre:
            r = P(r)
        err0 = norm(r)
        # Small state follows the SOLUTION dtype, not the (always real)
        # norm: for complex operators φ/μ/ω carry complex shadow products
        # (the it>0 refresh φᵢ ← <r⋅pᵢ> is complex) — a real dtype here
        # makes the lax.cond branches disagree.  Identity for real dtypes.
        dtype = jnp.result_type(
            jnp.asarray(err0).dtype,
            *[l.dtype for l in jax.tree_util.tree_leaves(r)],
        )
        phi = jnp.zeros((s,), dtype=dtype).at[0].set(err0)
        mu = jnp.eye(s, dtype=dtype)
        omega = jnp.ones((), dtype=dtype)
        # The shadow space only depends on the initial residual (reference
        # builds it at the FIRST inner_init, :129-141, where r is still r₀),
        # so build it here — this also keeps every lax.cond/while carry with
        # a uniform sharding-variance under shard_map.
        Pspace = build_shadow_space(r, phi)
        # stacked_zeros derives from r, so U/G are already device-varying
        # under shard_map (uniform while-loop carry signature).
        U = v.stacked_zeros(r, s)
        G = v.stacked_zeros(r, s)
        return (r, Pspace, U, G, phi, mu, omega), err0

    def build_shadow_space(r, phi):
        """First-cycle shadow space: p₀ = r/φ₀, then MGS-orthonormalized
        Gaussian vectors (:109-141)."""
        Pspace = v.stacked_zeros(r, s)
        p0 = v.scale(safe_divide(1.0, phi[0]), r)
        Pspace = v.set_stacked(Pspace, 0, p0)
        key = jax.random.PRNGKey(shadow_seed)
        leaves, treedef = jax.tree_util.tree_flatten(r)
        for i in range(1, s):
            if shadow is not None:
                p_i = v.get_stacked(shadow, i - 1)
            else:
                key, sub = jax.random.split(key)
                subkeys = jax.random.split(sub, len(leaves))
                p_i = jax.tree_util.tree_unflatten(
                    treedef,
                    [
                        jax.random.normal(kk, l.shape, l.dtype)
                        for kk, l in zip(subkeys, leaves)
                    ],
                )
            for j in range(i):
                p_j = v.get_stacked(Pspace, j)
                p_i = v.xpay(p_i, -dot(p_i, p_j), p_j)
            p_i = v.scale(safe_divide(1.0, norm(p_i)), p_i)
            Pspace = v.set_stacked(Pspace, i, p_i)
        return Pspace

    def iterate_fn(it, x, state):
        r, Pspace, U, G, phi, mu, omega = state
        k = it % s
        idx = jnp.arange(s)

        # --- inner_init at cycle start (:104-147): refresh φᵢ ← <pᵢ⋅r>.
        # At it == 0 keep the exact (‖r₀‖, 0, …, 0) from init (the shadow
        # space itself is built once in init_fn; μ = I and ω = 1 already
        # hold there, so no reset is needed).
        # Shadow products are written dot(X, pᵢ) = Σ X·conj(pᵢ) = pᵢᴴX —
        # LINEAR in the updated operand X, so the textbook updates below
        # (β zeroing pᵢᴴr, α zeroing pᵢᴴg) hold for complex operators.
        # For real dtypes the operand order is bit-irrelevant.
        phi = lax.cond(
            jnp.logical_and(k == 0, it > 0),
            lambda: jnp.stack([dot(r, v.get_stacked(Pspace, i)) for i in range(s)]),
            lambda: phi,
        )

        # --- γ ← (μₖ:ₛ₋₁,ₖ:ₛ₋₁)⁻¹·φₖ:ₛ₋₁ forward substitution (:160-173) ---
        gamma = jnp.zeros_like(phi)
        for i in range(s):
            acc = phi[i]
            for j in range(i):
                acc = acc - jnp.where(j >= k, mu[i, j] * gamma[j], 0.0)
            g_i = safe_divide(acc, mu[i, i])
            gamma = gamma.at[i].set(jnp.where(i >= k, g_i, 0.0))

        # --- v ← r − Σᵢ≥ₖ γᵢ·gᵢ; RightPre: v ← 𝓟v (:175-202) ---
        coeffs = jnp.where(idx >= k, gamma, 0.0)
        vvec = v.sub(r, v.lincomb_stacked(coeffs, G))
        if right_pre:
            vvec = P(vvec)

        # --- uₖ ← ω·v + Σᵢ≥ₖ γᵢ·uᵢ; gₖ ← 𝓟?𝓐uₖ (:203-211) ---
        u_k = v.axpy(omega, vvec, v.lincomb_stacked(coeffs, U))
        g_k = A(u_k)
        if left_pre:
            g_k = P(g_k)

        # --- Biorthogonalize against p₀..pₖ₋₁ (:213-226) ---
        for i in range(s):
            p_i = v.get_stacked(Pspace, i)
            alpha = jnp.where(
                i < k, safe_divide(dot(g_k, p_i), mu[i, i]), 0.0
            )
            u_k = v.xpay(u_k, -alpha, v.get_stacked(U, i))
            g_k = v.xpay(g_k, -alpha, v.get_stacked(G, i))

        # --- New column of μ: μᵢₖ ← <pᵢ⋅gₖ> for i ≥ k (:228-236) ---
        pg = jnp.stack([dot(g_k, v.get_stacked(Pspace, i)) for i in range(s)])
        new_col = jnp.where(idx >= k, pg, _col(mu, k))  # i < k entries stay stale,
        mu = lax.dynamic_update_slice(  # as in :234-236
            mu, new_col[:, None], (jnp.zeros_like(k), k)
        )

        U = v.set_stacked(U, k, u_k)
        G = v.set_stacked(G, k, g_k)

        # --- β ← φₖ/μₖₖ; x += β·uₖ; r −= β·gₖ (:238-246) ---
        mu_kk = _col(mu, k)[k]
        beta = safe_divide(phi[k], mu_kk)
        x = v.xpay(x, beta, u_k)
        r = v.xpay(r, -beta, g_k)

        # --- φᵢ −= β·μᵢₖ for i > k (:248-256) ---
        phi = jnp.where(idx > k, phi - beta * _col(mu, k), phi)

        # --- At k == s−1: enter the next 𝒢 subspace (:258-280) ---
        def next_subspace(args):
            x, r, omega = args
            if left_pre:
                v2 = P(A(r))
                z2 = r
            elif right_pre:
                z2 = P(r)
                v2 = A(z2)
            else:
                v2 = A(r)
                z2 = r
            # ω minimizes ‖r − ω·v₂‖ ⇒ ω = v₂ᴴr / v₂ᴴv₂ = dot(r,v₂)/dot(v₂,v₂)
            # (conjugation convention; elementwise-identical for real dtypes).
            om = safe_divide(dot(r, v2), dot(v2, v2))
            x = v.xpay(x, om, z2 if right_pre else r)
            r = v.xpay(r, -om, v2)
            return x, r, om

        x, r, omega = lax.cond(
            k == s - 1, next_subspace, lambda a: a, (x, r, omega)
        )

        return x, (r, Pspace, U, G, phi, mu, omega), norm(r)

    return run_iterative(init_fn, iterate_fn, None, x0, opts)


def _col(mat: jax.Array, k) -> jax.Array:
    """mat[:, k] with a traced k."""
    return lax.dynamic_slice_in_dim(mat, k, 1, axis=1)[:, 0]
