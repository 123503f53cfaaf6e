"""Distributed banded (DIA) operators: ppermute halo exchange.

For a banded operator, a row-block partition needs only the band edges of
its two NEIGHBOR blocks — H = max|offset| values each way — so the halo
exchange is two ``lax.ppermute`` neighbor shifts riding ICI, not an
all-gather (SURVEY §5 "ring-style neighbor exchange (`lax.ppermute`) for
halos").  Combined with the gather-free DIA SpMV this is the
speed-of-light multi-chip sparse path:

    per CG iteration: 2 ppermutes (halo) + 2 psums (dots), everything else
    device-local elementwise FMA streams.

Outer boundary parts receive zeros from the missing neighbor (ppermute's
default), which is exactly correct because out-of-band DIA data entries
are zero.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from stormx.solvers import SOLVERS, SolverOptions, make_operator

__all__ = ["PartitionedDIA", "partition_dia", "sharded_dia_solve"]

AXIS = "parts"


@dataclass(frozen=True)
class PartitionedDIA:
    """A DIA operator split into P contiguous row blocks.

    ``data``: (P, num_diags, n_loc); ``offsets`` static.  Halo width
    ``h = max|offset|`` must satisfy ``h <= n_loc`` (one neighbor each way).
    """

    num_parts: int
    n_global: int
    n_loc: int
    h: int
    offsets: tuple[int, ...]
    data: jnp.ndarray

    def local_matvec(self, axis_name: str):
        h, n_loc, offsets = self.h, self.n_loc, self.offsets

        def matvec(x_loc, data_loc):
            # Neighbor halos: my tail → right neighbor's left halo, my head
            # → left neighbor's right halo.  Missing links zero-fill.
            p = jax.lax.axis_size(axis_name)
            fwd = [(i, i + 1) for i in range(p - 1)]
            bwd = [(i + 1, i) for i in range(p - 1)]
            left = lax.ppermute(x_loc[-h:], axis_name, fwd) if h else None
            right = lax.ppermute(x_loc[:h], axis_name, bwd) if h else None
            x_ext = jnp.concatenate([left, x_loc, right]) if h else x_loc
            y = jnp.zeros_like(x_loc)
            for d, off in enumerate(offsets):
                y = y + data_loc[d] * lax.slice(
                    x_ext, (h + off,), (h + off + n_loc,)
                )
            return y

        return matvec


def partition_dia(dia, num_parts: int) -> PartitionedDIA:
    """Split a DIA operator into P contiguous row blocks (host-side)."""
    n = dia.shape[0]
    D = dia.num_diags
    Pn = num_parts
    n_loc = -(-n // Pn)
    h = max(abs(o) for o in dia.offsets)
    if h > n_loc:
        raise ValueError(
            f"band halo {h} exceeds local rows {n_loc}; use fewer parts"
        )
    data = np.asarray(dia.data)
    if n_loc * Pn != n:
        data = np.pad(data, ((0, 0), (0, n_loc * Pn - n)))
    data = data.reshape(D, Pn, n_loc).transpose(1, 0, 2)  # (P, D, n_loc)
    return PartitionedDIA(
        num_parts=Pn,
        n_global=n,
        n_loc=n_loc,
        h=h,
        offsets=dia.offsets,
        data=jnp.asarray(data),
    )


def _partition_vec(pdia: PartitionedDIA, x) -> jnp.ndarray:
    x = jnp.asarray(x)
    pad = pdia.num_parts * pdia.n_loc - pdia.n_global
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(pdia.num_parts, pdia.n_loc)


def sharded_dia_solve(
    pdia: PartitionedDIA,
    b,
    x0=None,
    *,
    mesh,
    method: str = "cg",
    options: SolverOptions | None = None,
    precond_diag=None,
    **solver_kw,
):
    """Krylov solve with the banded operator sharded over ``mesh``.

    The whole while-loop runs inside one shard_map region: ppermute halos
    inside the operator, psum reductions inside the dots.
    """
    opts = options or SolverOptions()
    solver_fn = SOLVERS[method.lower()]
    local_mv = pdia.local_matvec(AXIS)

    bp = _partition_vec(pdia, b)
    xp0 = _partition_vec(pdia, x0) if x0 is not None else jnp.zeros_like(bp)

    extras = {}
    if precond_diag is not None:
        extras["diag"] = _partition_vec(pdia, np.asarray(precond_diag))
    extra_keys = tuple(extras)

    def local_solve(b_loc, x0_loc, data, *extra_vals):
        b_loc, x0_loc, data = b_loc[0], x0_loc[0], data[0]
        op = make_operator(lambda v: local_mv(v, data))
        pre = None
        kw = dict(solver_kw)
        for key, val in zip(extra_keys, extra_vals):
            if key == "diag":
                from stormx.precond import JacobiPreconditioner

                pre = JacobiPreconditioner(diag=val[0])
            else:
                kw[key] = val[0]
        res = solver_fn(
            op, b_loc, x0_loc, precond=pre, options=opts, axis_name=AXIS, **kw
        )
        return res._replace(x=res.x[None])

    from stormx.solvers.base import SolveResult

    out_specs = SolveResult(
        x=P(AXIS),
        converged=P(),
        num_iterations=P(),
        absolute_error=P(),
        relative_error=P(),
        history=P(),
    )
    n_args = 3 + len(extras)
    sharded = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=tuple([P(AXIS)] * n_args),
        out_specs=out_specs,
    )
    args = (bp, xp0, pdia.data) + tuple(extras[k] for k in extra_keys)
    res = jax.jit(sharded)(*args)
    x_global = res.x.reshape(-1)[: pdia.n_global]
    return res._replace(x=x_global)
