"""Restarted GMRES and FGMRES (Saad).

Transcribed from ``Solvers/SolverGmres.hpp:41-310``:
  * restart length m = ``num_inner_iterations`` (default 50, ``Solver.hpp:159``);
  * modified Gram–Schmidt Arnoldi (``:157-162``) — inherently sequential, so it
    runs as a dynamic-bound ``lax.fori_loop`` of fused dot+axpy steps;
  * Givens QR via ``sym_ortho`` (``:176-183``);
  * back-substitution in ``inner_finalize`` (``:207-248``), invoked at restart
    boundaries and once more at exit for a partial cycle;
  * FGMRES stores zₖ = 𝓟qₖ per iteration and forces right preconditioning
    (``:96-97,128-130``).

The Krylov basis is a stacked pytree (m+1 leading axis), so "combine basis
vectors" compiles to one (m+1,)·(m+1, n) contraction per leaf.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from stormx.ops import sym_ortho
from stormx.ops import vector as v
from stormx.solvers.base import SolveResult, SolverOptions, resolve_side, run_iterative
from stormx.solvers.operator import as_operator
from stormx.solvers.preconditioner import PreconditionerSide, build_preconditioner

__all__ = ["gmres", "fgmres"]


def _base_gmres(
    op,
    b,
    x0,
    *,
    flexible: bool,
    precond,
    options: SolverOptions | None,
    restart: int,
    axis_name: str | None,
    orthog: str = "mgs",
) -> SolveResult:
    opts = options or SolverOptions()
    m = restart
    A = as_operator(op)
    P = build_preconditioner(precond, x0, b, A)
    side = resolve_side(opts.pre_side, precond=P, solver='gmres')
    # Flexible GMRES forces right preconditioning (SolverGmres.hpp:96-97).
    left_pre = P is not None and not flexible and side == PreconditionerSide.LEFT
    right_pre = P is not None and (flexible or side == PreconditionerSide.RIGHT)

    store_z = flexible and P is not None

    def norm(x):
        return v.norm_2(x, axis_name=axis_name)

    def dot(a, c):
        return v.dot(a, c, axis_name=axis_name)

    def make_q0(x):
        """q₀ ← 𝓟?(b − 𝓐x); β₀ ← ‖q₀‖; q₀ /= β₀ (:72-91,100-117)."""
        q0 = A.residual(b, x)
        if left_pre:
            q0 = P(q0)
        beta0 = norm(q0)
        q0 = v.scale(1.0 / beta0, q0)
        return q0, beta0

    def init_fn(x):
        q0, beta0 = make_q0(x)
        # Small-state dtype must follow the SOLUTION dtype, not the (always
        # real) norm: for complex operators H/cs/sn/beta carry complex
        # entries — a real dtype here silently truncates the imaginary
        # parts in the .at[] scatters and the residual estimate lies.
        import jax as _jax

        dtype = jnp.result_type(
            jnp.asarray(beta0).dtype,
            *[l.dtype for l in _jax.tree_util.tree_leaves(q0)],
        )
        Q = v.set_stacked(v.stacked_zeros(q0, m + 1), 0, q0)
        Z = v.stacked_zeros(q0, m) if store_z else None
        H = jnp.zeros((m + 1, m), dtype=dtype)
        cs = jnp.zeros((m,), dtype=dtype)
        sn = jnp.zeros((m,), dtype=dtype)
        beta = jnp.zeros((m + 1,), dtype=dtype).at[0].set(beta0)
        return (Q, Z, H, cs, sn, beta), beta0

    def inner_iterate(k, x, state):
        Q, Z, H, cs, sn, beta = state
        q_k = v.get_stacked(Q, k)

        # New Krylov vector (:132-156).
        if left_pre:
            q_new = P(A(q_k))
        elif right_pre:
            z = P(q_k)
            q_new = A(z)
            if store_z:
                Z = v.set_stacked(Z, k, z)
        else:
            q_new = A(q_k)

        h = jnp.zeros((m + 1,), dtype=beta.dtype)
        if orthog == "mgs":
            # Modified Gram–Schmidt (:157-162) — the reference's scheme:
            # k+1 sequential dot+axpy pairs.

            def mgs_body(i, carry):
                q_acc, h_acc = carry
                q_i = v.get_stacked(Q, i)
                hik = dot(q_acc, q_i)
                h_acc = h_acc.at[i].set(hik)
                q_acc = v.xpay(q_acc, -hik, q_i)
                return q_acc, h_acc

            q_new, h = lax.fori_loop(0, k + 1, mgs_body, (q_new, h))
        elif orthog == "cgs2":
            # Classical Gram–Schmidt with reorthogonalization ("CGS2",
            # Giraud et al.): each pass is ONE stacked dot (an (m+1,n)@(n,)
            # matvec on the MXU) + one stacked linear combination, instead
            # of k+1 sequential reductions — the TPU-friendly choice, and
            # under shard_map it needs one psum per pass instead of k+1.
            # Numerically: two CGS passes are as stable as MGS for Arnoldi.
            mask = (jnp.arange(m + 1) <= k).astype(beta.dtype)
            for _ in range(2):
                hk = v.dots_stacked(Q, q_new, axis_name=axis_name) * mask
                q_new = v.sub(q_new, v.lincomb_stacked(hk, Q))
                h = h + hk
        else:
            raise ValueError(f"unknown orthogonalization {orthog!r}")
        hk1 = norm(q_new)
        h = h.at[k + 1].set(hk1)
        q_new = v.scale(1.0 / hk1, q_new)
        Q = v.set_stacked(Q, k + 1, q_new)

        # Apply stored Givens rotations to column k (:176-180).  The
        # unitary rotation is [[conj(cs), conj(sn)], [-sn, cs]]; jnp.conj
        # is the identity for real dtypes, so the real path is unchanged
        # bit-for-bit while complex operators stay norm-preserving (the
        # residual estimate |β(k+1)| relies on unitarity).
        def givens_body(i, h_acc):
            chi = jnp.conj(cs[i]) * h_acc[i] + jnp.conj(sn[i]) * h_acc[i + 1]
            h_acc = h_acc.at[i + 1].set(-sn[i] * h_acc[i] + cs[i] * h_acc[i + 1])
            return h_acc.at[i].set(chi)

        h = lax.fori_loop(0, k, givens_body, h)

        # New rotation, eliminate H(k+1, k) (:181-183).
        cs_k, sn_k, _ = sym_ortho(h[k], h[k + 1])
        h = (
            h.at[k]
            .set(jnp.conj(cs_k) * h[k] + jnp.conj(sn_k) * h[k + 1])
            .at[k + 1]
            .set(0.0)
        )
        cs = cs.at[k].set(cs_k)
        sn = sn.at[k].set(sn_k)
        H = lax.dynamic_update_slice(H, h[:, None], (jnp.zeros_like(k), k))

        # β-solution update (:187-189); residual estimate = |β(k+1)|.
        beta = beta.at[k + 1].set(-sn_k * beta[k])
        beta = beta.at[k].set(jnp.conj(cs_k) * beta[k])
        return x, (Q, Z, H, cs, sn, beta), jnp.abs(beta[k + 1])

    def inner_finalize(k, x, state):
        """Back-substitute H·β and fold the correction into x (:194-248)."""
        Q, Z, H, cs, sn, beta = state

        def back_body(ii, beta_acc):
            i = k - ii

            def row(beta_acc):
                def acc_body(j, s):
                    return s - jnp.where(j <= k, H[i, j] * beta_acc[j], 0.0)

                s = lax.fori_loop(i + 1, m, acc_body, beta_acc[i])
                return beta_acc.at[i].set(s / H[i, i])

            return lax.cond(i >= 0, row, lambda ba: ba, beta_acc)

        beta = lax.fori_loop(0, m, back_body, beta)

        idx = jnp.arange(m + 1)
        if not right_pre:
            coeffs = jnp.where(idx <= k, beta, 0.0)
            x = v.add(x, v.lincomb_stacked(coeffs, Q))
        elif store_z:
            coeffs = jnp.where(idx[:m] <= k, beta[:m], 0.0)
            x = v.add(x, v.lincomb_stacked(coeffs, Z))
        else:
            coeffs = jnp.where(idx <= k, beta, 0.0)
            q_combo = v.lincomb_stacked(coeffs, Q)
            x = v.add(x, P(q_combo))
        return x

    def iterate_fn(it, x, state):
        j = it % m

        # inner_init at restart boundaries (except the very first cycle,
        # covered by outer init) — Solver.hpp:239-242.
        def restart_state(state):
            Q, Z, H, cs, sn, beta = state
            q0, beta0 = make_q0(x)
            Q = v.set_stacked(Q, 0, q0)
            beta = beta.at[0].set(beta0)
            return (Q, Z, H, cs, sn, beta)

        state = lax.cond(
            jnp.logical_and(j == 0, it > 0), restart_state, lambda s: s, state
        )
        x, state, err = inner_iterate(j, x, state)

        # inner_finalize at cycle end (Solver.hpp:244-246).
        x = lax.cond(
            j == m - 1, lambda: inner_finalize(j, x, state), lambda: x
        )
        return x, state, err

    def finalize_fn(it, x, state):
        # Solver.hpp:250-257: finalize a partial cycle at exit.
        j_last = (it - 1) % m
        return lax.cond(
            j_last != m - 1,
            lambda: inner_finalize(j_last, x, state),
            lambda: x,
        )

    return run_iterative(init_fn, iterate_fn, finalize_fn, x0, opts)


def gmres(
    op,
    b,
    x0,
    *,
    precond=None,
    options: SolverOptions | None = None,
    restart: int = 50,
    axis_name: str | None = None,
    orthog: str = "mgs",
) -> SolveResult:
    """Restarted GMRES (``SolverGmres.hpp:282-283``).

    ``orthog``: "mgs" (reference parity, the serial default) or "cgs2"
    (batched classical GS with reorthogonalization — one MXU matvec +
    one psum per pass).  Measured on TPU v5e (4.2M-row DIA operator,
    slope protocol, BENCH_NOTES r5) the two are a single-chip tie:
    5.85 (MGS) vs 6.05 (CGS2) ms/iter.  Distributed, MGS costs k+1
    sequential psum round trips per inner step vs CGS2's 2, so the
    ``stormx.parallel`` solve entry points default GMRES-family methods
    to ``orthog="cgs2"`` (see ``parallel.sharded._orthog_default``)."""
    return _base_gmres(
        op,
        b,
        x0,
        flexible=False,
        precond=precond,
        options=options,
        restart=restart,
        axis_name=axis_name,
        orthog=orthog,
    )


def fgmres(
    op,
    b,
    x0,
    *,
    precond=None,
    options: SolverOptions | None = None,
    restart: int = 50,
    axis_name: str | None = None,
    orthog: str = "mgs",
) -> SolveResult:
    """Flexible GMRES (``SolverGmres.hpp:308-310``): right preconditioning
    only; zₖ stored per iteration so 𝓟 may vary between iterations."""
    return _base_gmres(
        op,
        b,
        x0,
        flexible=True,
        precond=precond,
        options=options,
        restart=restart,
        axis_name=axis_name,
        orthog=orthog,
    )
