"""Distributed (shard-safe) aggregation AMG — the O(n) partition-invariant
preconditioner for ``sharded_solve`` (VERDICT r2 #6; reference lists AMG as
*Planned*, ``README.md:71-82``).

Structure per apply (one symmetric V-cycle):

* **fine smooth** — weighted Jacobi using the solve's own halo-exchanging
  local operator (bit-consistent with the outer Krylov matvec);
* **restrict** — shard-local ``segment_sum`` by aggregate id into the
  coarse space, then ONE ``psum`` (aggregates may straddle partition
  boundaries; the psum completes their sums).  The coarse residual is then
  REPLICATED on every shard;
* **coarse correct** — the serial :class:`~stormx.precond.multigrid.
  AmgPreconditioner` V-cycle on the Galerkin coarse operator, computed
  redundantly (and identically) on every shard — coarse levels are small,
  so replication beats communication;
* **prolong** — one shard-local gather ``e_c[agg]``; **post-smooth** same
  as pre-smooth, so the cycle is symmetric (piecewise-constant R = Pᵀ,
  Jacobi smoother) — CG-safe on SPD operators.

Partition invariance: everything except the restriction psum (and the
outer solve's dots) is bit-exact per shard.  Unlike plain sharded CG
(whose dot-psum regrouping leaves fp64 histories matching to ~1e-13), the
restriction psum perturbs the PRECONDITIONER itself, and that perturbation
feeds back through the search directions — measured histories agree across
P to ~1e-7 relative (the tested contract; see tests/test_distributed_amg
and CLAUDE.md).  That looseness is inherent to replicated-coarse AMG, not
a bug to tighten.
"""

from __future__ import annotations

import numpy as np

from stormx.precond.multigrid import AmgPreconditioner, _coarsen, aggregate

__all__ = ["DistributedAmg"]


class DistributedAmg:
    """Host-built factors for a distributed AMG V-cycle.

    ``csr``: the GLOBAL operator (original row order);
    ``pop``: the :class:`~stormx.parallel.partition.PartitionedOperator`
    the solve will run with (provides the slot layout).

    Pass to :func:`stormx.parallel.sharded_solve` as ``amg=<this>``.
    """

    def __init__(self, csr, pop, *, num_sweeps: int = 1,
                 omega: float = 2.0 / 3.0, coarse_size: int = 64,
                 max_levels: int = 10):
        import jax.numpy as jnp

        self.num_sweeps = num_sweeps
        self.omega = omega

        row_ptr = np.asarray(csr.row_ptr).astype(np.int64)
        cols = np.asarray(csr.indices).astype(np.int64)
        vals = np.asarray(csr.data).astype(np.float64)
        n = csr.shape[0]

        agg = aggregate(row_ptr, cols, vals, n)
        nc = int(agg.max()) + 1
        self.nc = nc

        rows = np.repeat(np.arange(n), np.diff(row_ptr))
        diag = np.zeros(n)
        np.add.at(diag, rows[cols == rows], vals[cols == rows])
        inv_diag = np.where(diag != 0.0, 1.0 / np.where(diag == 0, 1, diag), 0.0)

        # Slot layout (padding slots: aggregate id nc = dump, inv_diag 0).
        P, n_pad = pop.num_parts, pop.n_pad
        slot_agg = np.full(P * n_pad, nc, dtype=np.int32)
        slot_agg[pop.fill_slots] = agg[pop.perm].astype(np.int32)
        slot_idiag = np.zeros(P * n_pad)
        slot_idiag[pop.fill_slots] = inv_diag[pop.perm]
        self.agg_slots = jnp.asarray(slot_agg.reshape(P, n_pad))
        self.idiag_slots = jnp.asarray(slot_idiag.reshape(P, n_pad))

        # Galerkin coarse operator (global, replicated) → serial V-cycle.
        c_ptr, c_cols, c_vals = _coarsen(row_ptr, cols, vals, n, agg, nc)
        from stormx.sparse.formats import CSR

        coarse_csr = CSR(
            data=jnp.asarray(c_vals),
            indices=jnp.asarray(c_cols.astype(np.int32)),
            row_ptr=jnp.asarray(c_ptr.astype(np.int32)),
            shape=(nc, nc),
        )
        self.coarse = AmgPreconditioner(
            coarse_csr, num_sweeps=num_sweeps, coarse_size=coarse_size,
            max_levels=max_levels, omega=omega,
        )

    def extras(self) -> dict:
        """Per-shard arrays for sharded_solve's extras plumbing."""
        return {"amg_agg": self.agg_slots, "amg_idiag": self.idiag_slots}

    def make_apply(self, mv, agg_loc, idiag_loc, axis_name: str):
        """Build the local V-cycle apply closure (inside shard_map).

        ``mv``: the halo-exchanging LOCAL matvec (n_pad,) → (n_pad,).
        """
        import jax.numpy as jnp
        from jax import lax

        from stormx.ops.segment import segment_sum

        nc, omega, sweeps = self.nc, self.omega, self.num_sweeps
        coarse = self.coarse

        def apply(r):
            # Pre-smooth from zero: first sweep collapses to ω·D⁻¹·r.
            x = omega * idiag_loc * r
            for _ in range(sweeps - 1):
                x = x + omega * idiag_loc * (r - mv(x))
            # Restrict the residual: local partial sums + one psum.
            rr = r - mv(x)
            rc = segment_sum(rr, agg_loc, nc + 1)  # slot nc = padding dump
            rc = lax.psum(rc, axis_name)[:nc]
            ec = coarse(rc)  # replicated serial V-cycle on A_c
            ec_ext = jnp.concatenate([ec, jnp.zeros((1,), ec.dtype)])
            x = x + ec_ext[agg_loc]
            # Post-smooth (same smoother ⇒ symmetric cycle).
            for _ in range(sweeps):
                x = x + omega * idiag_loc * (r - mv(x))
            return x

        return apply
