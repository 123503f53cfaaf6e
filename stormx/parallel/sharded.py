"""Sharded Krylov solves: the whole convergence loop inside shard_map.

The two communication points of a Krylov iteration on a partitioned mesh
(SURVEY §3.1) map to:

  * dot products / norms → ``lax.psum`` over the mesh axis (already inside
    ``stormx.ops.vector`` via ``axis_name``);
  * the operator's halo exchange → one ``lax.all_gather`` of shared-boundary
    cells inside the local SpMV.

Everything else is device-local, so the entire ``lax.while_loop`` lives in
one shard_map region — one XLA program per solve, collectives riding ICI.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from stormx.parallel.partition import PartitionedOperator, partition_vector, unpartition_vector
from stormx.solvers import SOLVERS, SolverOptions, make_operator

__all__ = ["make_device_mesh", "sharded_solve", "sharded_matvec"]

AXIS = "parts"


_NONCE = itertools.count()


def _instance_key(obj, keepalive=None):
    """Solve-cache key for a preconditioner/AMG instance: identity PLUS the
    scalar configuration so mutating e.g. ``omega`` or ``num_sweeps``
    between solves re-traces instead of silently reusing a program with the
    old constants baked in (round-3 advisor finding).  Identity is a
    per-instance monotonic nonce, NOT raw ``id()`` — CPython recycles ids
    after GC, which could alias a dead instance's cached program (round-4
    advisor finding).  Array attributes still key by id (jax arrays are
    immutable and unhashable); ``keepalive`` strong-refs every id-keyed
    object so those ids stay unique for the cache entry's lifetime."""
    if obj is None:
        return None
    if keepalive is not None:
        keepalive.append(obj)
    nonce = getattr(obj, "_stormx_nonce", None)
    if nonce is None:
        nonce = next(_NONCE)
        try:
            object.__setattr__(obj, "_stormx_nonce", nonce)
        except (AttributeError, TypeError):
            nonce = id(obj)  # __slots__ instance: id, pinned by keepalive
    scalars = []
    for k, v in vars(obj).items():
        if k.startswith("_"):
            continue
        if isinstance(v, (int, float, str, bool, type(None))):
            scalars.append((k, v))
        else:
            if keepalive is not None:
                keepalive.append(v)
            scalars.append((k, id(v)))
    return (nonce, tuple(sorted(scalars)))


def _kw_key(solver_kw, keepalive):
    """Hashable key for solver kwargs; id-keyed values are pinned via
    ``keepalive`` (same contract as :func:`_instance_key`)."""
    items = []
    for k, v in solver_kw.items():
        if isinstance(v, (int, float, str, bool, type(None))):
            items.append((k, v))
        else:
            keepalive.append(v)
            items.append((k, id(v)))
    return tuple(sorted(items))


_GMRES_FAMILY = frozenset({"gmres", "fgmres", "lgmres", "lfgmres"})


def _orthog_default(method, solver_kw):
    """CGS2 is the *distributed* GMRES-family default.

    Each CGS2 pass is one batched (k+1, n)·(n,) product → 2 psums per
    inner step at any basis length k, vs MGS's k+1 sequential
    dot→psum→axpy round trips (latency-bound on a mesh).  Single-chip
    wall time is a measured tie — 5.85 (MGS) vs 6.05 (CGS2) ms/iter on
    the 4.2M-row DIA operator (BENCH_NOTES r5) — so the collective count
    decides.  An explicit ``orthog=`` always wins; serial `gmres()` keeps
    the reference-parity MGS default (``SolverGmres.hpp:157-162``).
    """
    if method.lower() in _GMRES_FAMILY and "orthog" not in solver_kw:
        solver_kw = dict(solver_kw, orthog="cgs2")
    return solver_kw


def make_device_mesh(num_parts: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    num_parts = num_parts or len(devices)
    return Mesh(np.array(devices[:num_parts]), (AXIS,))


def sharded_matvec(pop: PartitionedOperator, mesh: Mesh, *, overlap: bool = True):
    """Build a jitted global matvec (P, n_pad) → (P, n_pad) over the mesh."""
    local = pop.local_matvec(AXIS, overlap=overlap)

    def fn(x, *ops):
        # shard_map blocks keep a leading axis of length 1 — strip/restore it.
        return local(x[0], *(o[0] for o in ops))[None]

    op_args = (
        pop.data, pop.cols, pop.send_slots,
        pop.bnd_idx, pop.bnd_data, pop.bnd_cols,
    )
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple([P(AXIS)] * (1 + len(op_args))),
        out_specs=P(AXIS),
    )
    return jax.jit(lambda x: sharded(x, *op_args))


def sharded_solve(
    pop: PartitionedOperator,
    b,
    x0=None,
    *,
    mesh: Mesh | None = None,
    method: str = "cg",
    options: SolverOptions | None = None,
    precond_diag=None,
    precond=None,
    ras: str | None = None,
    amg=None,
    overlap: bool = True,
    **solver_kw,
):
    """Solve A·x = b with the operator partitioned over the device mesh.

    ``b``/``x0`` are *global* (n,) vectors; the result is returned global.
    The full solver while-loop runs inside shard_map: per-iteration
    reductions are psums, halo exchange is an all_gather, no host round
    trips.

    Preconditioning options:

    * ``precond_diag`` — a *global* (n,) diagonal; partitioned and applied
      as shard-local Jacobi scaling.
    * ``precond`` — a shard-safe :class:`~stormx.solvers.preconditioner.
      Preconditioner` instance.  Its apply runs *inside* shard_map on local
      shards, so it must be built from replicated state (explicit scalars)
      and touch the vector only through elementwise math or the operator
      itself — e.g. ``ChebyshevPreconditioner(degree=k, lambda_max=λ,
      ratio=r)`` (each polynomial term calls the halo-exchanging local
      operator, so it is distributed-correct by construction) or a
      ``KrylovPreconditioner`` with an inner method + ``axis_name`` wiring
      handled here.  GLOBAL host-factorized preconditioners (ILU/IC/SGS/AMG
      instances from :mod:`stormx.precond`) hold global index tables and
      are NOT shard-safe — use ``ras`` instead.
    * ``amg`` — a :class:`stormx.parallel.amg.DistributedAmg` built for
      THIS ``pop``: shard-local Jacobi smoothing through the halo-exchanging
      operator, psum-restricted coarse correction on a replicated Galerkin
      hierarchy.  Partition-invariant to fp64 rounding and O(n) — the
      multilevel option RAS cannot offer.
    * ``ras`` — ``"ilu0"`` or ``"sgs"``: restricted additive Schwarz — each
      partition's OWNED diagonal block is host-factorized and applied
      locally (:mod:`stormx.parallel.ras`).  Unlike every other option the
      preconditioned operator depends on the partition count (block
      coupling is dropped at partition boundaries), so histories are NOT
      partition-invariant — expect iteration counts to grow with P.
      ILU(0) blocks are nonsymmetric → pair with BiCGStab/GMRES; SGS blocks
      of an SPD operator stay SPD → CG-safe.
    """
    mesh = mesh or make_device_mesh(pop.num_parts)
    opts = options or SolverOptions()
    solver_kw = _orthog_default(method, solver_kw)
    solver_fn = SOLVERS[method.lower()]
    local_mv = pop.local_matvec(AXIS, overlap=overlap)

    bp = partition_vector(pop, b)
    xp0 = (
        partition_vector(pop, x0)
        if x0 is not None
        else jnp.zeros_like(bp)
    )

    extras = {}
    if precond_diag is not None:
        extras["diag"] = partition_vector(pop, np.asarray(precond_diag))
    if ras is not None:
        if precond_diag is not None or precond is not None or amg is not None:
            raise ValueError("ras=... excludes precond/precond_diag/amg")
        from stormx.parallel.ras import build_ras_factors

        extras.update(build_ras_factors(pop, kind=ras))
    if amg is not None:
        if precond_diag is not None or precond is not None:
            raise ValueError("amg=... excludes precond/precond_diag")
        extras.update(amg.extras())
    if method.lower() == "idrs" and "shadow" not in solver_kw:
        # The shadow basis must be drawn in GLOBAL layout: device-local
        # draws with a replicated key tile the same values on every device,
        # making the basis (and hence the convergence history) depend on
        # the partition count.  Padding slots stay exactly zero so MGS
        # norms are partition-invariant.
        from stormx.solvers.idrs import _SHADOW_SEED

        s = solver_kw.get("s", 4)
        seed = solver_kw.pop("shadow_seed", _SHADOW_SEED)
        raws = np.random.default_rng(seed).standard_normal((s - 1, pop.n_global))
        extras["shadow"] = jnp.stack(
            [partition_vector(pop, row) for row in raws], axis=1
        )  # (P, s-1, n_pad)
    extra_keys = tuple(extras)

    # Program cache: repeated solves with the same (pop, mesh, method,
    # options, preconditioning setup) — the shape of every time-stepping
    # app — must not re-trace/re-jit each call.  Arrays travel as call
    # arguments; everything baked into the trace is part of the key.
    keepalive = []
    kw_key = _kw_key(solver_kw, keepalive)
    cache_key = (
        mesh, method.lower(), opts, extra_keys, overlap, ras, kw_key,
        _instance_key(precond, keepalive),
        _instance_key(amg, keepalive),
    )
    cache = pop.__dict__.get("_solve_cache")
    if cache is None:
        cache = {}
        object.__setattr__(pop, "_solve_cache", cache)
    cached = cache.get(cache_key)
    if cached is not None:
        res = cached(
            bp, xp0, pop.data, pop.cols, pop.send_slots,
            pop.bnd_idx, pop.bnd_data, pop.bnd_cols,
            *(extras[k] for k in extra_keys),
        )
        return res._replace(x=unpartition_vector(pop, res.x))

    def local_solve(b_loc, x0_loc, data, cols, send, bidx, bdata, bcols, *extra_vals):
        b_loc, x0_loc = b_loc[0], x0_loc[0]
        data, cols, send = data[0], cols[0], send[0]
        bidx, bdata, bcols = bidx[0], bdata[0], bcols[0]
        op = make_operator(
            lambda v: local_mv(v, data, cols, send, bidx, bdata, bcols)
        )
        kw = dict(solver_kw)
        pre = precond
        if pre is not None and hasattr(pre, "with_axis_name"):
            # Functional re-wire (KrylovPreconditioner: inner psums); never
            # mutate the user's instance.
            pre = pre.with_axis_name(AXIS)
        ras_vals = {}
        amg_vals = {}
        for key, val in zip(extra_keys, extra_vals):
            if key == "diag":
                from stormx.precond import JacobiPreconditioner

                pre = JacobiPreconditioner(diag=val[0])
            elif key.startswith("ras_"):
                ras_vals[key] = val[0]
            elif key.startswith("amg_"):
                amg_vals[key] = val[0]
            else:
                kw[key] = val[0]
        if amg_vals:
            from stormx.solvers.preconditioner import FunctionPreconditioner

            pre = FunctionPreconditioner(
                amg.make_apply(
                    op.mul, amg_vals["amg_agg"], amg_vals["amg_idiag"], AXIS
                )
            )
        if ras_vals:
            from stormx.precond.triangular import TriangularFactor, tri_solve
            from stormx.solvers.preconditioner import FunctionPreconditioner

            f1 = TriangularFactor(
                ras_vals["ras_lr1"], ras_vals["ras_ec1"],
                ras_vals["ras_ev1"], ras_vals["ras_id1"],
            )
            f2 = TriangularFactor(
                ras_vals["ras_lr2"], ras_vals["ras_ec2"],
                ras_vals["ras_ev2"], ras_vals["ras_id2"],
            )
            mid = ras_vals["ras_mid"]

            def ras_apply(r, f1=f1, f2=f2, mid=mid):
                return tri_solve(f2, mid * tri_solve(f1, r))

            pre = FunctionPreconditioner(ras_apply)
        res = solver_fn(
            op,
            b_loc,
            x0_loc,
            precond=pre,
            options=opts,
            axis_name=AXIS,
            **kw,
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
    args = (
        bp, xp0, pop.data, pop.cols, pop.send_slots,
        pop.bnd_idx, pop.bnd_data, pop.bnd_cols,
    ) + tuple(extras[k] for k in extra_keys)
    sharded = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=tuple([P(AXIS)] * len(args)),
        out_specs=out_specs,
    )
    jitted = jax.jit(sharded)
    cache[cache_key] = jitted
    # Pin every id-keyed object so its id cannot be recycled into a false
    # cache hit while this entry lives ("_keepalive" is a string key; real
    # entries are keyed by tuples, so no collision).
    pins = pop.__dict__.setdefault("_solve_cache_pins", [])
    pins.extend(keepalive)
    res = jitted(*args)
    x_global = unpartition_vector(pop, res.x)
    return res._replace(x=x_global)
