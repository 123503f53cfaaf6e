"""BiCGStab (van der Vorst) and BiCGStab(l) (Sleijpen–Fokkema).

Recurrences transcribed from ``Solvers/SolverBiCgStab.hpp``:
  * BiCGStab: ``:52-167`` — 2 operator products + 4 dots per iteration.
  * BiCGStab(l): ``:184-383`` — inner-outer with l = num_inner_iterations
    (default 2, ``:379-381``); BiCG sweep + minimal-residual polynomial part
    with τ/γ recurrences.  The i ≤ j loops run over the static range [0, l]
    with masks on the traced inner index j, so the loop body stays a single
    traced program.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from stormx.ops import safe_divide
from stormx.ops import vector as v
from stormx.solvers.base import SolveResult, SolverOptions, resolve_side, run_iterative
from stormx.solvers.operator import as_operator
from stormx.solvers.preconditioner import PreconditionerSide, build_preconditioner

__all__ = ["bicgstab", "bicgstab_l"]


def bicgstab(
    op,
    b,
    x0,
    *,
    precond=None,
    options: SolverOptions | None = None,
    axis_name: str | None = None,
) -> SolveResult:
    opts = options or SolverOptions()
    A = as_operator(op)
    P = build_preconditioner(precond, x0, b, A)
    side = resolve_side(opts.pre_side, precond=P, solver='bicgstab')
    left_pre = P is not None and side == PreconditionerSide.LEFT
    right_pre = P is not None and side == PreconditionerSide.RIGHT

    def init_fn(x):
        # r ← b − 𝓐x; LeftPre: r ← 𝓟r; r̃ ← r; ρ ← <r̃⋅r> (:72-90).
        r = A.residual(b, x)
        if left_pre:
            r = P(r)
        r_tilde = r
        rho = v.dot(r, r_tilde, axis_name=axis_name)
        zeros = v.zeros_like(r)
        one = jnp.ones_like(rho)
        # state: (r, r_tilde, p, v_vec, alpha, rho, omega)
        return (r, r_tilde, zeros, zeros, one, rho, one), jnp.sqrt(jnp.real(rho))  # <r,r> — real for complex too

    def iterate_fn(it, x, state):
        r, r_tilde, p, vv, alpha, rho, omega = state

        # p-update (:101-120).
        def do_first():
            return r, rho

        def do_rest():
            rho_new = v.dot(r, r_tilde, axis_name=axis_name)
            beta = safe_divide(alpha * rho_new, omega * rho)
            p_new = v.xpay(r, beta, v.xpay(p, -omega, vv))
            return p_new, rho_new

        p, rho = lax.cond(it == 0, do_first, do_rest)

        # v ← 𝓐/𝓟 chain; α ← ρ/<r̃⋅v>; x += α·(z|p); r −= α·v (:122-141).
        if left_pre:
            vv = P(A(p))
            z = p
        elif right_pre:
            z = P(p)
            vv = A(z)
        else:
            vv = A(p)
            z = p
        alpha = safe_divide(rho, v.dot(vv, r_tilde, axis_name=axis_name))
        x = v.xpay(x, alpha, z if right_pre else p)
        r = v.xpay(r, -alpha, vv)

        # t-step: ω ← <t⋅r>/<t⋅t>; x += ω·(z|r); r −= ω·t (:143-162).
        if left_pre:
            t = P(A(r))
            z2 = r
        elif right_pre:
            z2 = P(r)
            t = A(z2)
        else:
            t = A(r)
            z2 = r
        omega = safe_divide(
            v.dot(r, t, axis_name=axis_name), v.dot(t, t, axis_name=axis_name)
        )
        x = v.xpay(x, omega, z2 if right_pre else r)
        r = v.xpay(r, -omega, t)

        return x, (r, r_tilde, p, vv, alpha, rho, omega), v.norm_2(
            r, axis_name=axis_name
        )

    return run_iterative(init_fn, iterate_fn, None, x0, opts)


def bicgstab_l(
    op,
    b,
    x0,
    *,
    precond=None,
    options: SolverOptions | None = None,
    l: int = 2,
    axis_name: str | None = None,
) -> SolveResult:
    """BiCGStab(l).  The preconditioner is always applied as 𝓟∘𝓐 (the
    reference uses the chained ``pre_op->mul(y, z, lin_op, x)`` form
    regardless of ``pre_side``; ``SolverBiCgStab.hpp:275-299``)."""
    opts = options or SolverOptions()
    A = as_operator(op)
    P = build_preconditioner(precond, x0, b, A)

    def PA(x):
        y = A(x)
        return P(y) if P is not None else y

    def dot(a, c):
        return v.dot(a, c, axis_name=axis_name)

    def init_fn(x):
        # u₀ ← 0; r₀ ← 𝓟(b − 𝓐x); r̃ ← r₀; ρ ← <r̃⋅r₀> (:213-233).
        r0 = A.residual(b, x)
        if P is not None:
            r0 = P(r0)
        r_tilde = r0
        rho = dot(r0, r_tilde)
        R = v.set_stacked(v.stacked_zeros(r0, l + 1), 0, r0)
        U = v.stacked_zeros(r0, l + 1)
        alpha = jnp.zeros_like(rho)
        omega = jnp.zeros_like(rho)
        return (R, U, r_tilde, alpha, rho, omega), jnp.sqrt(jnp.real(rho))  # <r,r> — real for complex too

    def iterate_fn(it, x, state):
        R, U, r_tilde, alpha, rho, omega = state
        j = it % l

        # --- BiCG part (:242-283) ---
        r_j = v.get_stacked(R, j)

        def do_first():
            # u₀ ← r₀.
            U_new = v.set_stacked(U, 0, v.get_stacked(R, 0))
            return U_new, rho

        def do_rest():
            rho_new = dot(r_j, r_tilde)
            beta = safe_divide(alpha * rho_new, rho)
            # uᵢ ← rᵢ − β·uᵢ for i = 0..j (masked over static range).
            U_new = U
            for i in range(l + 1):
                r_i = v.get_stacked(R, i)
                u_i = v.get_stacked(U_new, i)
                cand = v.xpay(r_i, -beta, u_i)
                U_new = v.set_stacked(U_new, i, v.tree_where(i <= j, cand, u_i))
            return U_new, rho_new

        U, rho = lax.cond(it == 0, do_first, do_rest)

        # uⱼ₊₁ ← 𝓟𝓐uⱼ; α ← ρ/<r̃⋅uⱼ₊₁>; rᵢ −= α·uᵢ₊₁ for i = 0..j.
        u_j = v.get_stacked(U, j)
        u_j1 = PA(u_j)
        U = v.set_stacked(U, j + 1, u_j1)
        alpha = safe_divide(rho, dot(u_j1, r_tilde))
        R_new = R
        for i in range(l):
            r_i = v.get_stacked(R_new, i)
            u_i1 = v.get_stacked(U, i + 1)
            cand = v.xpay(r_i, -alpha, u_i1)
            R_new = v.set_stacked(R_new, i, v.tree_where(i <= j, cand, r_i))
        R = R_new

        # x += α·u₀; rⱼ₊₁ ← 𝓟𝓐rⱼ (:285-299).
        x = v.xpay(x, alpha, v.get_stacked(U, 0))
        R = v.set_stacked(R, j + 1, PA(v.get_stacked(R, j)))

        # --- Minimal-residual part at j == l−1 (:301-372) ---
        def mr_part(args):
            x, R, U, rho, omega = args
            tau = jnp.zeros((l + 1, l + 1), dtype=rho.dtype)
            sigma = jnp.zeros((l + 1,), dtype=rho.dtype)
            gamma_bar = jnp.zeros((l + 1,), dtype=rho.dtype)
            # MGS over r₁..r_l (:313-322).
            for jj in range(1, l + 1):
                r_jj = v.get_stacked(R, jj)
                for ii in range(1, jj):
                    r_ii = v.get_stacked(R, ii)
                    t_ij = safe_divide(dot(r_ii, r_jj), sigma[ii])
                    tau = tau.at[ii, jj].set(t_ij)
                    r_jj = v.xpay(r_jj, -t_ij, r_ii)
                R = v.set_stacked(R, jj, r_jj)
                sigma = sigma.at[jj].set(dot(r_jj, r_jj))
                gamma_bar = gamma_bar.at[jj].set(
                    safe_divide(dot(v.get_stacked(R, 0), r_jj), sigma[jj])
                )
            # γ recurrences (:339-351).
            gamma = jnp.zeros((l + 1,), dtype=rho.dtype)
            gamma = gamma.at[l].set(gamma_bar[l])
            omega_new = gamma_bar[l]
            rho_new = rho * (-omega_new)
            for jj in range(l - 1, 0, -1):
                acc = gamma_bar[jj]
                for ii in range(jj + 1, l + 1):
                    acc = acc - tau[jj, ii] * gamma[ii]
                gamma = gamma.at[jj].set(acc)
            gamma_bbar = jnp.zeros((l + 1,), dtype=rho.dtype)
            for jj in range(1, l):
                acc = gamma[jj + 1]
                for ii in range(jj + 1, l):
                    acc = acc + tau[jj, ii] * gamma[ii + 1]
                gamma_bbar = gamma_bbar.at[jj].set(acc)
            # Solution/residual/search-direction updates (:353-371).
            x = v.xpay(x, gamma[1], v.get_stacked(R, 0))
            r0 = v.xpay(v.get_stacked(R, 0), -gamma_bar[l], v.get_stacked(R, l))
            u0 = v.xpay(v.get_stacked(U, 0), -gamma[l], v.get_stacked(U, l))
            for jj in range(1, l):
                x = v.xpay(x, gamma_bbar[jj], v.get_stacked(R, jj))
                r0 = v.xpay(r0, -gamma_bar[jj], v.get_stacked(R, jj))
                u0 = v.xpay(u0, -gamma[jj], v.get_stacked(U, jj))
            R = v.set_stacked(R, 0, r0)
            U = v.set_stacked(U, 0, u0)
            return x, R, U, rho_new, omega_new

        x, R, U, rho, omega = lax.cond(
            j == l - 1, mr_part, lambda a: a, (x, R, U, rho, omega)
        )

        err = v.norm_2(v.get_stacked(R, 0), axis_name=axis_name)
        return x, (R, U, r_tilde, alpha, rho, omega), err

    return run_iterative(init_fn, iterate_fn, None, x0, opts)
