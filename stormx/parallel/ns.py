"""Fully-distributed Navier–Stokes projection: ONE shard_map program per
step (BASELINE config #5: "partitioned mesh across N ≥ 2 hosts,
halo-overlapped SpMV, IDR(s) vs BiCGStab(l)").

:class:`stormx.apps.navier_stokes.NsProjection` distributes only the
pressure Poisson solve; here the WHOLE projection step — predictor (LSQ
convection + two-point viscous fluxes), divergence, pressure Krylov solve,
and corrector — runs inside a single shard_map region:

* cells are block-partitioned in NATURAL order, shared between the FV halo
  tables (:class:`stormx.parallel.fvm.PartitionedFv`) and the Poisson
  operator (``partition_csr(..., reorder=False)``) — both pad to the same
  ``n_loc = ceil(n/P)``, so vectors flow between the phases with no
  relayout;
* three ``all_gather`` halo exchanges per step (velocity for the
  predictor, u* for the face fluxes, p for the corrector) plus the
  overlapped all-gathers inside the Krylov loop;
* every per-cell accumulation keeps the serial per-row summation order, so
  the predictor/divergence/corrector are BIT-exact against
  :class:`~stormx.apps.navier_stokes.NsProjection`; only the pressure
  Krylov dots change their summation grouping (local-sum + psum), the
  same ~1e-15-per-iteration wobble every sharded solve carries.

The reference has no NS solver — provenance is the composed stormx
operators (``Feathers/GradientScheme.hpp`` LSQ, ``Playground.cpp:116-131``
two-point fluxes) and the BASELINE config text.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from stormx.fvm.divgrad import assemble_divgrad
from stormx.fvm.gradient import lsq_gradient_matrices, lsq_gradients
from stormx.ops import safe_divide
from stormx.parallel.fvm import partition_fv
from stormx.parallel.partition import partition_csr
from stormx.parallel.sharded import AXIS, make_device_mesh
from stormx.solvers import SOLVERS, SolverOptions, make_operator
from stormx.solvers.base import SolveResult

__all__ = ["ShardedNsProjection"]


class ShardedNsProjection:
    """Chorin projection with the ENTIRE step sharded over the device mesh.

    Drop-in distributed counterpart of
    :class:`stormx.apps.navier_stokes.NsProjection`: ``step(vel, dt)``
    returns ``(vel', p, result)`` with the same numerics (see module
    docstring for the exactness contract).
    """

    def __init__(self, mesh, *, nu: float = 1e-2, num_parts: int,
                 method: str = "idrs", device_mesh=None,
                 solver_kw: dict | None = None):
        self.dmesh = mesh.device_arrays()
        self.nu = nu
        self.method = method.lower()
        self.solver_kw = dict(solver_kw or {})
        self.num_parts = num_parts
        self.mesh = device_mesh or make_device_mesh(num_parts)

        # FV halo tables and the Poisson operator share the natural-order
        # block layout (both pad to n_loc = ceil(n/P)).
        self.pfv = partition_fv(self.dmesh, num_parts, halo_depth=2)
        self.pop = partition_csr(
            assemble_divgrad(mesh).to_csr(), num_parts, reorder=False
        )
        assert self.pop.n_pad == self.pfv.n_loc, "layout mismatch"
        n, n_loc = self.pfv.n_global, self.pfv.n_loc
        real = np.zeros((num_parts, n_loc), dtype=bool)
        real.reshape(-1)[:n] = True
        self._real = jnp.asarray(real)

        self._extras = {}
        if self.method == "idrs":
            # Global-layout shadow space (CLAUDE.md numerics invariant).
            from stormx.solvers.idrs import _SHADOW_SEED

            s = self.solver_kw.get("s", 4)
            seed = self.solver_kw.pop("shadow_seed", _SHADOW_SEED)
            raws = np.random.default_rng(seed).standard_normal((s - 1, n))
            pad = num_parts * n_loc - n
            raws = np.pad(raws, ((0, 0), (0, pad)))
            self._extras["shadow"] = jnp.asarray(
                raws.reshape(s - 1, num_parts, n_loc).transpose(1, 0, 2)
            )  # (P, s-1, n_loc)
        self._step = None

    # ------------------------------------------------------------------
    def _build_step(self):
        pfv, pop = self.pfv, self.pop
        n, n_loc, dim = pfv.n_global, pfv.n_loc, self.dmesh.cell_centers.shape[1]
        nu = self.nu
        solver_fn = SOLVERS[self.method]
        opts = self.solver_kw.pop("options", None) or SolverOptions()
        from stormx.parallel.sharded import _orthog_default

        solver_kw = _orthog_default(self.method, dict(self.solver_kw))
        local_mv = pop.local_matvec(AXIS)
        extra_keys = tuple(self._extras)

        def local_step(vel_loc, dt, real, *tabs_and_op):
            tabs = [t[0] for t in tabs_and_op[:13]]
            (f_n, f_a, f_c, f_l, l_in, l_out, c_v, c_c, adj, cf, cs, send,
             hsrc) = tabs
            op_arrs = [t[0] for t in tabs_and_op[13:19]]
            data_l, cols_l, send_l, bidx, bdata, bcols = op_arrs
            extra_vals = [t[0] for t in tabs_and_op[19:]]
            vel_loc, real = vel_loc[0], real[0]
            dt = dt  # replicated scalar

            lm = SimpleNamespace(
                cell_centers=c_c,
                cell_volumes=c_v,
                cell_adj_ell=adj,
                cell_face_ell=cf,
                cell_face_sign=cs,
                face_centers=f_c,
            )
            g_mats = lsq_gradient_matrices(lm)
            # Two-point flux coefficient: 0 on boundary/padded faces
            # (l_out == l_in ⇒ dist 0), matching serial face_dist.
            f_dist = jnp.linalg.norm(c_c[l_out] - c_c[l_in], axis=1)
            coef = safe_divide(f_a, f_dist)

            def exchange(u):
                contrib = u[send]
                pool = lax.all_gather(contrib, AXIS)
                u_halo = pool.reshape((-1,) + u.shape[1:])[hsrc]
                return jnp.concatenate([u, u_halo, u[:1]])  # dump = copy

            # --- predictor: u* = u + dt·(ν∇²u − (u·∇)u) on owned cells ---
            vel_full = exchange(vel_loc)  # (c_max, dim)
            grads = lsq_gradients(lm, vel_full, g_mats)  # (c_max, dim, d)
            conv = jnp.einsum("nd,nod->no", vel_full, grads)[:n_loc]
            diff = vel_full[l_out] - vel_full[l_in]  # (f_max, dim)
            flux_v = nu * coef[:, None] * diff
            g = flux_v[cf]  # (c_max, K, dim)
            visc = (jnp.sum(cs[..., None] * g, axis=1) / c_v[:, None])[:n_loc]
            v_star = vel_loc + dt * (visc - conv)

            # --- divergence of u* from face fluxes -----------------------
            vs_full = exchange(v_star)
            v_in, v_out = vs_full[l_in], vs_full[l_out]
            v_face = 0.5 * (v_in + v_out)  # == v_in on boundary (l_out=l_in)
            flux = jnp.einsum("fd,fd->f", v_face, f_n) * f_a
            gf = flux[cf]
            div = (jnp.sum(cs * gf, axis=1) / c_v)[:n_loc]

            # --- pressure Poisson: ∇²p = div/dt, mean-free ---------------
            rhs = jnp.where(real, div / dt, 0.0)
            mean = lax.psum(jnp.sum(rhs), AXIS) / n
            rhs = jnp.where(real, rhs - mean, 0.0)
            op = make_operator(
                lambda v_: local_mv(v_, data_l, cols_l, send_l, bidx, bdata, bcols)
            )
            kw = dict(solver_kw)
            for key, val in zip(extra_keys, extra_vals):
                kw[key] = val
            res = solver_fn(
                op, rhs, jnp.zeros_like(rhs), options=opts, axis_name=AXIS, **kw
            )
            p_mean = lax.psum(jnp.sum(jnp.where(real, res.x, 0.0)), AXIS) / n
            p = jnp.where(real, res.x - p_mean, 0.0)

            # --- corrector: u = u* − dt·∇p -------------------------------
            p_full = exchange(p)
            grad_p = lsq_gradients(lm, p_full, g_mats)[:n_loc]
            vel_new = v_star - dt * grad_p

            return (
                vel_new[None],
                p[None],
                res._replace(x=res.x[None]),
            )

        out_specs = (
            P(AXIS),
            P(AXIS),
            SolveResult(
                x=P(AXIS), converged=P(), num_iterations=P(),
                absolute_error=P(), relative_error=P(), history=P(),
            ),
        )
        tabs = self.pfv.tables()
        op_args = (pop.data, pop.cols, pop.send_slots,
                   pop.bnd_idx, pop.bnd_data, pop.bnd_cols)
        extras = tuple(self._extras[k] for k in extra_keys)
        n_sharded = 13 + len(op_args) + len(extras)
        sharded = jax.shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(AXIS), P(), P(AXIS)) + tuple([P(AXIS)] * n_sharded),
            out_specs=out_specs,
        )

        def step(vel_p, dt):
            return sharded(vel_p, dt, self._real, *tabs, *op_args, *extras)

        return jax.jit(step)

    # ------------------------------------------------------------------
    def partition_velocity(self, vel):
        """Global (n, dim) → (P, n_loc, dim) block layout."""
        n, d = vel.shape
        pad = self.num_parts * self.pfv.n_loc - n
        vp = jnp.concatenate([jnp.asarray(vel), jnp.zeros((pad, d), vel.dtype)])
        return vp.reshape(self.num_parts, self.pfv.n_loc, d)

    def unpartition(self, xp):
        """(P, n_loc, ...) → global (n, ...)."""
        flat = jnp.asarray(xp).reshape((-1,) + xp.shape[2:])
        return flat[: self.pfv.n_global]

    def step(self, vel, dt):
        """One distributed projection step on a GLOBAL (n, dim) velocity.

        Returns ``(vel', p, result)`` in global layout.
        """
        if self._step is None:
            self._step = self._build_step()
        vel_p, p_p, res = self._step(self.partition_velocity(vel), dt)
        return (
            self.unpartition(vel_p),
            self.unpartition(p_p),
            res._replace(x=self.unpartition(res.x)),
        )
