"""Distributed SlicedELL: the multi-chip UNSTRUCTURED SpMV fast path.

After RCM the global operator is banded (bandwidth b ≪ n), so a contiguous
row-block partition needs only b-deep strips of its two NEIGHBOR blocks —
two ``lax.ppermute`` shifts riding ICI, exactly like the banded DIA path
(``stormx.parallel.banded``) — while each shard applies its rows with the
gather-free uniform-stride windowed kernel (``stormx.sparse.SlicedELL``,
~0.95 Gnnz/s per v5e chip on the reference step operator).  Halo and
interior compute OVERLAP: the row blocks whose windows stay inside the
owned slab carry no data dependence on the permutes.

This is the BASELINE north star assembled: partitioned unstructured SpMV
at the per-chip roofline with neighbor-only ICI halos overlapped with
interior compute, inside one ``shard_map`` region per solve.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from stormx.solvers import SOLVERS, SolverOptions, make_operator

__all__ = ["PartitionedSliced", "partition_sliced", "sharded_sliced_solve"]

AXIS = "parts"


@dataclass(frozen=True)
class PartitionedSliced:
    """A SlicedELL operator split into P contiguous row slabs.

    Per shard: ``nbl`` row blocks of ``R`` rows; block ``bl`` reads
    ``x_ext[R·bl : R·bl + C]`` where ``x_ext = [left halo h_lo | owned
    n_loc | right halo h_hi]`` with ``h_lo = pad_lo`` and
    ``h_hi = C − R − pad_lo`` (the upper band reach).  Outer edges zero-fill
    (ppermute default) — out-of-matrix window slots are never referenced by
    live data.
    """

    num_parts: int
    n_global: int
    n_loc: int  # owned rows per shard (multiple of R)
    pad_lo: int
    window: int  # C
    block_rows: int  # R
    mode: str  # "dense" (XLA MXU einsum) | "pallas" (window-gather kernel)
    dense_blocks: jnp.ndarray | None  # (P, nbl, R, C), mode="dense"
    ell_data: jnp.ndarray | None  # (P, nbl, R, K), mode="pallas"
    ell_cols: jnp.ndarray | None  # (P, nbl, R, K) int32, mode="pallas"
    perm: np.ndarray  # perm[new] = old row id (global RCM order)

    def op_arrays(self) -> tuple:
        """Device arrays fed to shard_map (leading axis = mesh axis)."""
        if self.mode == "dense":
            return (self.dense_blocks,)
        return (self.ell_data, self.ell_cols)

    @property
    def h_lo(self) -> int:
        return self.pad_lo

    @property
    def h_hi(self) -> int:
        return self.window - self.block_rows - self.pad_lo

    def local_matvec(self, axis_name: str, *, overlap: bool = True):
        R, C = self.block_rows, self.window
        n_loc, h_lo, h_hi = self.n_loc, self.h_lo, self.h_hi
        nbl = n_loc // R
        shifts = C // R

        def frames(y, count):
            """(count, C) sliding windows at stride R from a flat y."""
            yt = y.reshape(-1, R)
            return jnp.concatenate(
                [yt[j : j + count] for j in range(shifts)], axis=1
            )

        def permutes(x_loc):
            p = lax.axis_size(axis_name)
            fwd = [(i, i + 1) for i in range(p - 1)]
            bwd = [(i + 1, i) for i in range(p - 1)]
            left = lax.ppermute(x_loc[n_loc - h_lo :], axis_name, fwd)
            right = lax.ppermute(x_loc[:h_hi], axis_name, bwd)
            return left, right

        if self.mode == "dense":
            def contract(ops, win):
                (blocks,) = ops
                return jnp.einsum(
                    "brc,bc->br", blocks, win, precision=lax.Precision.HIGHEST
                ).reshape(-1)
        else:
            sub, K = R // 128, self.ell_data.shape[-1]

            def contract(ops, win):
                import jax as _jax

                from stormx.ops.pallas_sell import _apply

                data, cols = ops  # (m, R, K)
                m = data.shape[0]
                win3 = win.reshape(m, C // 128, 128)
                vt = data.reshape(m, sub, 128, K).transpose(0, 1, 3, 2)
                ct = cols.reshape(m, sub, 128, K).transpose(0, 1, 3, 2)
                return _apply(
                    win3,
                    vt.reshape(m, sub * K, 128),
                    ct.reshape(m, sub * K, 128),
                    sub=sub,
                    K=K,
                    interpret=_jax.default_backend() != "tpu",
                ).reshape(-1)

        def take(ops, lo, hi):
            return tuple(o[lo:hi] for o in ops)

        if not overlap:
            def matvec(x_loc, *ops):
                left, right = permutes(x_loc)
                x_ext = jnp.concatenate([left, x_loc, right])
                return contract(ops, frames(x_ext, nbl))

            return matvec

        # Interior blocks: window [R·bl − h_lo, R·bl − h_lo + C) within the
        # owned slab ⇒ bl ∈ [bl_lo, bl_hi).
        bl_lo = -(-h_lo // R)
        bl_hi = (n_loc - C + h_lo) // R + 1
        if bl_hi <= bl_lo:  # slab too thin to split — plain path
            return self.local_matvec(axis_name, overlap=False)

        def matvec(x_loc, *ops):
            left, right = permutes(x_loc)  # issued before interior compute
            # Interior: frames from x_loc alone (no halo dependence).
            off = bl_lo * R - h_lo
            y_mid = contract(
                take(ops, bl_lo, bl_hi),
                frames(
                    lax.slice(x_loc, (off,), (off + (bl_hi - bl_lo - 1) * R + C,)),
                    bl_hi - bl_lo,
                ),
            )
            # Boundary blocks consume the landed halos.
            x_ext = jnp.concatenate([left, x_loc, right])
            y_head = contract(
                take(ops, 0, bl_lo), frames(x_ext[: (bl_lo - 1) * R + C], bl_lo)
            )
            tail_n = nbl - bl_hi
            tail_start = bl_hi * R  # into x_ext coords: + h_lo
            y_tail = contract(
                take(ops, bl_hi, nbl),
                frames(
                    lax.slice(x_ext, (tail_start,), (tail_start + (tail_n - 1) * R + C,)),
                    tail_n,
                ),
            )
            return jnp.concatenate([y_head, y_mid, y_tail])

        return matvec


def partition_sliced(
    csr, num_parts: int, *, block_rows: int | None = None, mode: str = "auto"
) -> PartitionedSliced:
    """RCM-reorder a CSR operator and split the windowed form into P
    contiguous row slabs (host-side).

    ``mode="pallas"`` shards the O(nnz) ELL arrays and applies each slab
    with the window-gather kernel (10× the dense einsum per chip, 192×
    less operator memory on the step mesh — BENCH_NOTES.md);
    ``mode="dense"`` shards precomputed (nbl, R, C) dense windows.
    ``"auto"``: pallas on TPU for f32, dense elsewhere.
    """
    from stormx.sparse.windowed import sell_from_csr

    if mode == "auto":
        mode = (
            "pallas"
            if (
                jax.default_backend() == "tpu"
                and np.asarray(csr.data).dtype == np.float32
            )
            else "dense"
        )
    if block_rows is None:
        block_rows = 512 if mode == "pallas" else 128
    if mode == "pallas":
        # Validate the kernel contract NOW with a descriptive error rather
        # than an opaque reshape/Mosaic failure inside the shard_map trace
        # (round-3 advisor finding).
        if block_rows % 128:
            raise ValueError(
                f"mode='pallas' needs block_rows % 128 == 0 (got {block_rows});"
                " pass block_rows=None for the measured default, or use"
                " mode='dense'"
            )
        if np.asarray(csr.data).dtype != np.float32:
            raise ValueError(
                "mode='pallas' needs float32 operator data (got"
                f" {np.asarray(csr.data).dtype}); cast the CSR to f32 or use"
                " mode='dense'"
            )
    sell, perm = sell_from_csr(csr, block_rows=block_rows, mode=mode)
    n = csr.shape[0]
    R, C = block_rows, sell.window
    nb = sell.data.shape[0]
    nbl = -(-nb // num_parts)
    n_loc = nbl * R
    pad_b = nbl * num_parts - nb
    h_hi = C - R - sell.pad_lo
    if sell.pad_lo > n_loc or h_hi > n_loc:
        raise ValueError(
            f"band reach ({sell.pad_lo}/{h_hi}) exceeds slab rows {n_loc}; "
            "use fewer parts"
        )

    def shard(arr):
        arr = np.asarray(arr)
        if pad_b:
            arr = np.concatenate(
                [arr, np.zeros((pad_b,) + arr.shape[1:], arr.dtype)]
            )
        return jnp.asarray(arr.reshape((num_parts, nbl) + arr.shape[1:]))

    return PartitionedSliced(
        num_parts=num_parts,
        n_global=n,
        n_loc=n_loc,
        pad_lo=sell.pad_lo,
        window=C,
        block_rows=R,
        mode=mode,
        dense_blocks=shard(sell.dense_blocks) if mode == "dense" else None,
        ell_data=shard(sell.data) if mode == "pallas" else None,
        ell_cols=shard(sell.local_cols) if mode == "pallas" else None,
        perm=perm,
    )


def _partition_vec(ps: PartitionedSliced, x) -> jnp.ndarray:
    """Global (n,) in ORIGINAL order → (P, n_loc) in RCM slab layout."""
    x = jnp.asarray(x)[ps.perm]
    pad = ps.num_parts * ps.n_loc - ps.n_global
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(ps.num_parts, ps.n_loc)


def _unpartition_vec(ps: PartitionedSliced, xp) -> jnp.ndarray:
    inv = np.empty(ps.n_global, dtype=np.int64)
    inv[ps.perm] = np.arange(ps.n_global)
    return jnp.asarray(xp).reshape(-1)[: ps.n_global][inv]


def sharded_sliced_solve(
    ps: PartitionedSliced,
    b,
    x0=None,
    *,
    mesh,
    method: str = "cg",
    options: SolverOptions | None = None,
    precond_diag=None,
    overlap: bool = True,
    **solver_kw,
):
    """Krylov solve with the windowed unstructured operator sharded over
    ``mesh``: ppermute band halos (overlapped) + psum dots, the whole
    while-loop in one shard_map region.  ``b``/``x0``/result are global
    vectors in the ORIGINAL (pre-RCM) order."""
    opts = options or SolverOptions()
    from stormx.parallel.sharded import _orthog_default

    solver_kw = _orthog_default(method, solver_kw)
    solver_fn = SOLVERS[method.lower()]
    local_mv = ps.local_matvec(AXIS, overlap=overlap)

    bp = _partition_vec(ps, b)
    xp0 = _partition_vec(ps, x0) if x0 is not None else jnp.zeros_like(bp)

    extras = {}
    if precond_diag is not None:
        extras["diag"] = _partition_vec(ps, jnp.asarray(precond_diag))
    extra_keys = tuple(extras)

    n_op = len(ps.op_arrays())

    def local_solve(b_loc, x0_loc, *rest):
        op_vals, extra_vals = rest[:n_op], rest[n_op:]
        b_loc, x0_loc = b_loc[0], x0_loc[0]
        op_vals = tuple(o[0] for o in op_vals)
        op = make_operator(lambda v: local_mv(v, *op_vals))
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
        x=P(AXIS), converged=P(), num_iterations=P(),
        absolute_error=P(), relative_error=P(), history=P(),
    )
    args = (bp, xp0) + ps.op_arrays() + tuple(extras[k] for k in extra_keys)
    # Program cache (same contract as sharded_solve): repeated solves with
    # the same configuration must not re-trace.
    from stormx.parallel.sharded import _kw_key

    keepalive = []
    kw_key = _kw_key(solver_kw, keepalive)
    cache_key = (mesh, method.lower(), opts, extra_keys, overlap, kw_key)
    cache = ps.__dict__.get("_solve_cache")
    if cache is None:
        cache = {}
        object.__setattr__(ps, "_solve_cache", cache)
    jitted = cache.get(cache_key)
    if jitted is None:
        sharded = jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=tuple([P(AXIS)] * len(args)),
            out_specs=out_specs,
            # pallas_call inside shard_map cannot declare varying-mesh-axes
            # on its out_shape; disable the vma check for this region.
            check_vma=False,
        )
        jitted = jax.jit(sharded)
        cache[cache_key] = jitted
        pins = ps.__dict__.setdefault("_solve_cache_pins", [])
        pins.extend(keepalive)
    res = jitted(*args)
    return res._replace(x=_unpartition_vec(ps, res.x))
