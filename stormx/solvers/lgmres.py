"""LGMRES and LFGMRES — "loose" (augmented) restarted GMRES.

The reference lists **LGMRES** and **LFGMRES** as *Planned* solvers
(``README.md:66-67``); stormx implements both (Baker, Jessup & Manteuffel,
SIMAX 26(4), 2005).  Restarted GMRES forgets the whole Krylov space at each
restart and tends to alternate between two subspaces; LGMRES(m, k) augments
every cycle with the last ``k`` approximate error directions
``z_i = x_{i+1} − x_i``, which restores most of full-GMRES convergence at
restarted-GMRES memory cost.

Per cycle the method builds an orthonormal basis of
``K_m(𝓐, r) + span{z_1..z_k}`` with the same Arnoldi/Givens machinery as
:mod:`stormx.solvers.gmres`: steps ``j < m`` expand the Krylov part
(multiply q_j), steps ``j ≥ m`` multiply the stored error directions.  The
first cycle (no z's yet) is plain GMRES(m+k), as in the paper.

TPU notes: identical structure to the gmres module — stacked pytree bases,
``lax.fori_loop`` MGS or batched CGS2 orthogonalization, whole solve in one
``lax.while_loop``; the only extra state is the (k,)-stacked augmentation
basis and a shift-in at restart boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from stormx.ops import safe_divide, sym_ortho
from stormx.ops import vector as v
from stormx.solvers.base import SolveResult, SolverOptions, resolve_side, run_iterative
from stormx.solvers.operator import as_operator
from stormx.solvers.preconditioner import PreconditionerSide, build_preconditioner

__all__ = ["lgmres", "lfgmres"]


def _base_lgmres(
    op,
    b,
    x0,
    *,
    flexible: bool,
    precond,
    options: SolverOptions | None,
    restart: int,
    augment: int,
    axis_name: str | None,
    orthog: str = "mgs",
) -> SolveResult:
    opts = options or SolverOptions()
    m = restart
    k_aug = augment
    mm = m + k_aug  # inner steps per cycle
    A = as_operator(op)
    P = build_preconditioner(precond, x0, b, A)
    side = resolve_side(opts.pre_side, precond=P, solver='lgmres')
    left_pre = P is not None and not flexible and side == PreconditionerSide.LEFT
    right_pre = P is not None and (flexible or side == PreconditionerSide.RIGHT)
    store_z = flexible and P is not None

    def norm(x):
        return v.norm_2(x, axis_name=axis_name)

    def dot(a, c):
        return v.dot(a, c, axis_name=axis_name)

    def make_q0(x):
        q0 = A.residual(b, x)
        if left_pre:
            q0 = P(q0)
        beta0 = norm(q0)
        q0 = v.scale(safe_divide(1.0, beta0), q0)
        return q0, beta0

    def init_fn(x):
        q0, beta0 = make_q0(x)
        # Small-state dtype follows the SOLUTION dtype, not the (always
        # real) norm — complex operators carry complex H/cs/sn/beta entries
        # (see the same fix in gmres.py).
        dtype = jnp.result_type(
            jnp.asarray(beta0).dtype,
            *[l.dtype for l in jax.tree_util.tree_leaves(q0)],
        )
        Q = v.set_stacked(v.stacked_zeros(q0, mm + 1), 0, q0)
        # Derive Zaug's zeros from q0 (0·q0 broadcast) rather than fresh
        # jnp.zeros: under shard_map fresh zeros are replicated-typed, but
        # the restart branch writes device-varying data into Zaug, and
        # lax.cond requires both branches to agree on varying axes.
        Zaug = jax.tree_util.tree_map(
            lambda l: jnp.zeros((max(k_aug, 1),) + l.shape, l.dtype) + 0.0 * l,
            q0,
        )
        Z = v.stacked_zeros(q0, mm) if store_z else None
        H = jnp.zeros((mm + 1, mm), dtype=dtype)
        cs = jnp.zeros((mm,), dtype=dtype)
        sn = jnp.zeros((mm,), dtype=dtype)
        beta = jnp.zeros((mm + 1,), dtype=dtype).at[0].set(beta0)
        nz = jnp.asarray(0, dtype=jnp.int32)  # valid augmentation vectors
        return (Q, Zaug, Z, H, cs, sn, beta, x, nz), beta0

    def _aug_slot(j, nz):
        """Step j multiplies Zaug[j−m] iff j ∈ [m, m+nz)."""
        return jnp.logical_and(j >= m, j - m < nz)

    def inner_iterate(j, x, state):
        Q, Zaug, Z, H, cs, sn, beta, x_start, nz = state
        use_aug = _aug_slot(j, nz)
        d = v.tree_where(
            use_aug,
            v.get_stacked(Zaug, jnp.clip(j - m, 0, max(k_aug - 1, 0))),
            v.get_stacked(Q, j),
        )

        if left_pre:
            q_new = P(A(d))
        elif right_pre:
            z = P(d)
            q_new = A(z)
            if store_z:
                # Flexible: the Arnoldi expansion applied A to z = 𝓟(d) for
                # EVERY step (Krylov q_j and augmented Zaug alike), so z is
                # the per-step x-space direction for every step.  Storing
                # the raw augmented d instead would make the projected
                # residual diverge from the true residual after the first
                # augmented cycle.
                Z = v.set_stacked(Z, j, z)
        else:
            q_new = A(d)

        h = jnp.zeros((mm + 1,), dtype=beta.dtype)
        if orthog == "mgs":

            def mgs_body(i, carry):
                q_acc, h_acc = carry
                q_i = v.get_stacked(Q, i)
                hik = dot(q_acc, q_i)
                h_acc = h_acc.at[i].set(hik)
                q_acc = v.xpay(q_acc, -hik, q_i)
                return q_acc, h_acc

            q_new, h = lax.fori_loop(0, j + 1, mgs_body, (q_new, h))
        elif orthog == "cgs2":
            mask = (jnp.arange(mm + 1) <= j).astype(beta.dtype)
            for _ in range(2):
                hk = v.dots_stacked(Q, q_new, axis_name=axis_name) * mask
                q_new = v.sub(q_new, v.lincomb_stacked(hk, Q))
                h = h + hk
        else:
            raise ValueError(f"unknown orthogonalization {orthog!r}")
        hk1 = norm(q_new)
        h = h.at[j + 1].set(hk1)
        q_new = v.scale(safe_divide(1.0, hk1), q_new)
        Q = v.set_stacked(Q, j + 1, q_new)

        # Unitary rotation [[conj(cs), conj(sn)], [-sn, cs]] — jnp.conj is
        # the identity for real dtypes; complex operators need it for the
        # |β(j+1)| residual estimate to stay honest (see gmres.py).
        def givens_body(i, h_acc):
            chi = jnp.conj(cs[i]) * h_acc[i] + jnp.conj(sn[i]) * h_acc[i + 1]
            h_acc = h_acc.at[i + 1].set(-sn[i] * h_acc[i] + cs[i] * h_acc[i + 1])
            return h_acc.at[i].set(chi)

        h = lax.fori_loop(0, j, givens_body, h)
        cs_j, sn_j, _ = sym_ortho(h[j], h[j + 1])
        h = (
            h.at[j]
            .set(jnp.conj(cs_j) * h[j] + jnp.conj(sn_j) * h[j + 1])
            .at[j + 1]
            .set(0.0)
        )
        cs = cs.at[j].set(cs_j)
        sn = sn.at[j].set(sn_j)
        H = lax.dynamic_update_slice(H, h[:, None], (jnp.zeros_like(j), j))
        beta = beta.at[j + 1].set(-sn_j * beta[j])
        beta = beta.at[j].set(jnp.conj(cs_j) * beta[j])
        return x, (Q, Zaug, Z, H, cs, sn, beta, x_start, nz), jnp.abs(beta[j + 1])

    def correction(j, state):
        """The cycle's correction Δ (x-space) after back-substitution."""
        Q, Zaug, Z, H, cs, sn, beta, x_start, nz = state

        def back_body(ii, beta_acc):
            i = j - ii

            def row(beta_acc):
                def acc_body(jj, s):
                    return s - jnp.where(jj <= j, H[i, jj] * beta_acc[jj], 0.0)

                s = lax.fori_loop(i + 1, mm, acc_body, beta_acc[i])
                return beta_acc.at[i].set(safe_divide(s, H[i, i]))

            return lax.cond(i >= 0, row, lambda ba: ba, beta_acc)

        y = lax.fori_loop(0, mm, back_body, beta)
        idx = jnp.arange(mm + 1)
        active = idx <= j
        aug_mask = jnp.logical_and(_aug_slot(idx, nz), active)
        kry_mask = jnp.logical_and(jnp.logical_not(_aug_slot(idx, nz)), active)

        if store_z:
            coeffs = jnp.where(active[:mm], y[:mm], 0.0)
            return v.lincomb_stacked(coeffs, Z)
        # Krylov part (directions are the q_j themselves).
        delta = v.lincomb_stacked(jnp.where(kry_mask, y, 0.0), Q)
        if k_aug > 0:
            # Augmented part: coefficients y[m:m+k] gated by nz.
            aug_coeffs = jnp.where(aug_mask[m : m + k_aug], y[m : m + k_aug], 0.0)
            delta = v.add(delta, v.lincomb_stacked(aug_coeffs, Zaug))
        if right_pre:
            # The Arnoldi expansion applied A∘𝓟 to EVERY direction d —
            # Krylov q_j and augmented Zaug alike — so the x-space
            # correction is 𝓟 applied to the WHOLE combination.  Applying
            # 𝓟 to the Krylov part only desynchronizes the projected
            # residual |β_{j+1}| (the stopping test) from the true
            # residual after the first augmented cycle.
            delta = P(delta)
        return delta

    def inner_finalize(j, x, state):
        return v.add(x, correction(j, state))

    def iterate_fn(it, x, state):
        j = it % mm

        def restart_state(state):
            Q, Zaug, Z, H, cs, sn, beta, x_start, nz = state
            # Shift the just-completed cycle's (normalized) error direction
            # into the augmentation buffer: z = x − x_start.
            z_new = v.sub(x, x_start)
            zn = norm(z_new)
            z_new = v.scale(safe_divide(1.0, zn), z_new)
            if k_aug > 0:
                Zaug = v.roll_stacked(Zaug, 1)
                Zaug = v.set_stacked(Zaug, 0, z_new)
                nz = jnp.minimum(nz + (zn > 0), k_aug)
            q0, beta0 = make_q0(x)
            Q = v.set_stacked(Q, 0, q0)
            beta = jnp.zeros_like(beta).at[0].set(beta0)
            return (Q, Zaug, Z, H, cs, sn, beta, x, nz)

        state = lax.cond(
            jnp.logical_and(j == 0, it > 0), restart_state, lambda s: s, state
        )
        x, state, err = inner_iterate(j, x, state)
        x = lax.cond(j == mm - 1, lambda: inner_finalize(j, x, state), lambda: x)
        return x, state, err

    def finalize_fn(it, x, state):
        j_last = (it - 1) % mm
        return lax.cond(
            j_last != mm - 1,
            lambda: inner_finalize(j_last, x, state),
            lambda: x,
        )

    return run_iterative(init_fn, iterate_fn, finalize_fn, x0, opts)


def lgmres(
    op,
    b,
    x0,
    *,
    precond=None,
    options: SolverOptions | None = None,
    restart: int = 30,
    augment: int = 3,
    axis_name: str | None = None,
    orthog: str = "mgs",
) -> SolveResult:
    """LGMRES(m, k): restarted GMRES augmented with the last ``augment``
    error directions (reference ``README.md:66``, *Planned*)."""
    return _base_lgmres(
        op, b, x0, flexible=False, precond=precond, options=options,
        restart=restart, augment=augment, axis_name=axis_name, orthog=orthog,
    )


def lfgmres(
    op,
    b,
    x0,
    *,
    precond=None,
    options: SolverOptions | None = None,
    restart: int = 30,
    augment: int = 3,
    axis_name: str | None = None,
    orthog: str = "mgs",
) -> SolveResult:
    """Flexible LGMRES (reference ``README.md:67``, *Planned*): right
    preconditioning with per-step stored directions, so 𝓟 may vary."""
    return _base_lgmres(
        op, b, x0, flexible=True, precond=precond, options=options,
        restart=restart, augment=augment, axis_name=axis_name, orthog=orthog,
    )
