"""Chebyshev polynomial preconditioner — the TPU-native preconditioner.

The reference's preconditioner roadmap (``README.md:71-82``, all *Planned*)
is dominated by triangular-solve methods (ILU/ICC/SOR) that serialize on
TPU.  Chebyshev preconditioning needs ONLY operator applications — the one
thing the TPU sparse path does at roofline — and is a standard production
choice for SPD mesh operators:

    P ≈ A⁻¹  as the degree-k Chebyshev polynomial minimizing
    ‖1 − λ·p(λ)‖ over λ ∈ [λ_min, λ_max].

``build`` estimates λ_max by a few power iterations (deterministic seed
vector) and takes λ_min = λ_max/ratio (standard smoother convention);
``__call__`` runs the classic three-term recurrence — k operator products,
fully jittable, no data-dependent control flow.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from stormx.ops import vector as v
from stormx.solvers.operator import as_operator
from stormx.solvers.preconditioner import Preconditioner

PyTree = Any

__all__ = ["ChebyshevPreconditioner"]


class ChebyshevPreconditioner(Preconditioner):
    """Degree-``degree`` Chebyshev approximation of A⁻¹ on [λmax/ratio, λmax].

    ``lambda_max=None`` triggers power-iteration estimation in ``build``
    (``power_iters`` products, 1.05× safety factor).  ``axis_name`` makes
    the internal dot products psum across a shard_map mesh.
    """

    def __init__(
        self,
        degree: int = 4,
        *,
        lambda_max: float | None = None,
        ratio: float = 30.0,
        power_iters: int = 10,
        axis_name: str | None = None,
    ):
        self.degree = degree
        self.ratio = ratio
        self.power_iters = power_iters
        self.axis_name = axis_name
        self._lmax = lambda_max
        self._op = None

    def build(self, x, b, op):
        self._op = as_operator(op)
        if self._lmax is None:
            # Power iteration from a deterministic vector (all-ones is a bad
            # seed for symmetric stencils, so perturb it reproducibly).
            def body(_, carry):
                w, _ = carry
                aw = self._op(w)
                nrm = v.norm_2(aw, axis_name=self.axis_name)
                return v.scale(1.0 / nrm, aw), nrm

            leaves, treedef = jax.tree_util.tree_flatten(b)
            seed = jax.tree_util.tree_unflatten(
                treedef,
                [
                    jnp.cos(jnp.arange(l.size, dtype=l.dtype)).reshape(l.shape)
                    for l in leaves
                ],
            )
            w0 = v.scale(1.0 / v.norm_2(seed, axis_name=self.axis_name), seed)
            _, lmax = jax.lax.fori_loop(
                0, self.power_iters, body, (w0, jnp.zeros(()))
            )
            self._lmax = 1.05 * lmax
        return self

    def __call__(self, r):
        """Three-term Chebyshev recurrence for z ≈ A⁻¹ r."""
        lmax = self._lmax
        lmin = lmax / self.ratio
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma

        z = v.scale(1.0 / theta, r)  # degree-0 term
        if self.degree == 0:
            return z
        d = v.scale(1.0 / theta, r)
        for _ in range(self.degree):
            rho_new = 1.0 / (2.0 * sigma - rho)
            adz = self._op(z)
            resid = v.sub(r, adz)
            d = v.axpy(rho_new * rho, d, v.scale(2.0 * rho_new / delta, resid))
            z = v.add(z, d)
            rho = rho_new
        return z

    def conj_apply(self, r):
        # The polynomial in A is symmetric for symmetric A.
        return self(r)
