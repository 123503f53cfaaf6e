"""Gather-free block-aggregation AMG for banded (DIA) operators — the
TPU-native multigrid.

Why this exists: the general :class:`~stormx.precond.multigrid
.AmgPreconditioner` (MIS aggregation) applies its V-cycle with ELL gathers
(level matvecs), a ``segment_sum`` (restriction) and an ``agg`` gather
(prolongation) — all of which XLA serializes on TPU (~150M elems/s), so
at mesh scale one V-cycle costs more than dozens of plain CG iterations
and AMG loses wall-clock despite winning iterations (VERDICT r3 item 5).

This variant fixes the aggregation to **g consecutive rows** of the
band-reduced ordering (RCM neighbors are spatially adjacent, so the
aggregates are geometrically sane).  Then every V-cycle ingredient is a
TPU-native vector op:

* restriction  = ``r.reshape(nc, g).sum(1)``        (reshape-sum, no scatter)
* prolongation = ``jnp.repeat(e_c, g)``             (broadcast, no gather)
* level matvec = DIA shifted-slice FMA              (the 293 Gnnz/s format)
* smoother     = weighted Jacobi                    (elementwise)

and the Galerkin product R·A·P of a banded A stays banded: fine diagonal
``off`` feeds coarse diagonals ``off//g`` and ``off//g + 1`` only, so the
coarse hierarchy is computed host-side in O(nnz) vectorized NumPy per
level and every level stays DIA.

Symmetric (same pre/post Jacobi sweeps, R = Pᵀ) ⇒ CG-safe on SPD
operators.

Reference parity: the reference lists AMG as *Planned* and implements
nothing (``README.md:71-82``); this is the TPU-first realization.
"""

from __future__ import annotations

import numpy as np

from stormx.solvers.preconditioner import Preconditioner

__all__ = ["BlockDiaAmg"]

_LANES = 128


def _sum_matrix(g: int, dtype):
    """(128, 128/g) 0/1 matrix: S[l, c] = 1 iff lane l belongs to group c."""
    import jax.numpy as jnp

    lanes = np.arange(_LANES)
    s = (lanes[:, None] // g == np.arange(_LANES // g)[None, :])
    return jnp.asarray(s.astype(dtype))


def restrict_sum(r, nc: int, g: int):
    """Sum groups of ``g`` consecutive entries: (n,) → (nc,).

    TPU-native: ``(n,) → (n/128, 128)`` is a FREE row-major reshape (the
    lane layout), and the group sums are one small MXU matmul against a
    0/1 summing matrix at ``Precision.HIGHEST`` (exact f32 products).
    The naive ``r.reshape(nc, g).sum(1)`` relayouts the whole vector onto
    an 8-wide minor dim — measured 1.55 ms at 4.2M rows vs ~68 µs for a
    5-diagonal matvec (scripts/probe_blockamg_cost.py); this form is
    bandwidth-bound.  Requires ``g | 128`` (enforced by BlockDiaAmg).
    """
    import jax.numpy as jnp
    from jax import lax

    npad = -(-nc * g // _LANES) * _LANES
    if r.shape[0] < npad:
        r = jnp.pad(r, (0, npad - r.shape[0]))
    r2 = r[:npad].reshape(-1, _LANES)
    s = _sum_matrix(g, r.dtype)
    rc = jnp.matmul(r2, s, precision=lax.Precision.HIGHEST)
    return rc.reshape(-1)[:nc]


def prolong_repeat(e_c, n: int, g: int):
    """Adjoint of :func:`restrict_sum`: repeat each entry ``g`` times,
    (nc,) → (n,) — the same MXU matmul against Sᵀ, so R = Pᵀ exactly."""
    import jax.numpy as jnp
    from jax import lax

    gc = _LANES // g
    mpad = -(-e_c.shape[0] // gc) * gc
    if e_c.shape[0] < mpad:
        e_c = jnp.pad(e_c, (0, mpad - e_c.shape[0]))
    e2 = e_c.reshape(-1, gc)
    s = _sum_matrix(g, e_c.dtype)
    e = jnp.matmul(e2, s.T, precision=lax.Precision.HIGHEST)
    return e.reshape(-1)[:n]


def _coarsen_dia(offsets, data, n, g):
    """Galerkin R·A·P for piecewise-constant aggregation over g consecutive
    rows.  A_c[I, J] = Σ_{i//g == I} Σ_d [ (i+off_d)//g == J ] data[d, i].

    Returns (coarse_offsets, coarse_data, nc) in the same row-aligned DIA
    layout; O(nnz) vectorized."""
    nc = -(-n // g)
    i = np.arange(n)
    ci = i // g
    acc: dict[int, np.ndarray] = {}
    for d, off in enumerate(offsets):
        j = i + off
        valid = (j >= 0) & (j < n)
        cj = np.zeros_like(ci)
        cj[valid] = j[valid] // g
        oc = cj - ci
        for o in np.unique(oc[valid]):
            m = valid & (oc == o)
            buf = acc.setdefault(int(o), np.zeros(nc))
            np.add.at(buf, ci[m], data[d, m])
    coarse_offsets = tuple(sorted(acc))
    coarse = np.zeros((len(coarse_offsets), nc))
    for k, o in enumerate(coarse_offsets):
        coarse[k] = acc[o]
        # enforce the row-aligned zero-outside-band convention
        rows = np.arange(nc)
        coarse[k][(rows + o < 0) | (rows + o >= nc)] = 0.0
    return coarse_offsets, coarse, nc


class BlockDiaAmg(Preconditioner):
    """V-cycle AMG over g-row block aggregates of a DIA operator.

    ``dia``: :class:`stormx.sparse.formats.DIA` (already in its banded
    ordering — solve in that ordering, as the DIA fast path does anyway).
    ``group``: rows per aggregate (coarsening factor per level).
    """

    def __init__(self, dia, *, group: int = 4, num_sweeps: int = 1,
                 omega: float = 2.0 / 3.0, coarse_size: int = 256,
                 max_levels: int = 16, dtype=None):
        import jax.numpy as jnp

        from stormx.sparse.formats import DIA

        if group < 2:
            raise ValueError("group must be ≥ 2")
        if _LANES % group:
            raise ValueError(
                f"group must divide {_LANES} (lane-aligned MXU restriction); "
                f"got {group}"
            )
        self.group = g = int(group)
        self.num_sweeps = num_sweeps
        self.omega = omega

        offsets = tuple(int(o) for o in dia.offsets)
        data = np.asarray(dia.data, dtype=np.float64)
        n = dia.shape[0]
        dtype = dtype or np.asarray(dia.data).dtype
        if 0 not in offsets:
            raise ValueError("BlockDiaAmg needs an explicitly stored diagonal")

        self._levels = []
        while n > coarse_size and len(self._levels) < max_levels:
            diag0 = data[offsets.index(0)]
            inv_diag = np.where(diag0 != 0.0, 1.0 / np.where(diag0 == 0, 1, diag0), 0.0)
            self._levels.append(
                {
                    "op": DIA(
                        data=jnp.asarray(data.astype(dtype)),
                        offsets=offsets,
                        shape=(n, n),
                    ),
                    "inv_diag": jnp.asarray(inv_diag.astype(dtype)),
                    "n": n,
                    "nc": -(-n // g),
                }
            )
            offsets, data, n = _coarsen_dia(offsets, data, n, g)

        # Dense coarse factor (pinv: the top level of an SPD hierarchy is
        # SPD up to boundary zero-rows from padding).
        dense = np.zeros((n, n))
        rows = np.arange(n)
        for d, off in enumerate(offsets):
            valid = (rows + off >= 0) & (rows + off < n)
            dense[rows[valid], rows[valid] + off] = data[d, valid]
        self._coarse_inv = jnp.asarray(np.linalg.pinv(dense).astype(dtype))

    # -- device-side V-cycle (all vector ops, no gather/scatter) ------------
    def build(self, x, b, op):
        return self

    def _smooth(self, lvl, x, b, *, from_zero=False):
        sweeps = self.num_sweeps
        if from_zero:
            # First sweep from x = 0 collapses to ω·D⁻¹·b — skip the
            # matvec of zeros (measured 68 µs at 4.2M rows).
            x = self.omega * lvl["inv_diag"] * b
            sweeps -= 1
        for _ in range(sweeps):
            r = b - lvl["op"].matvec(x)
            x = x + self.omega * lvl["inv_diag"] * r
        return x

    def _vcycle(self, k, b):
        if k == len(self._levels):
            return self._coarse_inv @ b
        lvl = self._levels[k]
        g, n, nc = self.group, lvl["n"], lvl["nc"]
        x = self._smooth(lvl, None, b, from_zero=True)
        r = b - lvl["op"].matvec(x)
        r_c = restrict_sum(r, nc, g)
        e_c = self._vcycle(k + 1, r_c)
        x = x + prolong_repeat(e_c, n, g)
        return self._smooth(lvl, x, b)

    def __call__(self, r):
        return self._vcycle(0, r)

    def conj_apply(self, r):
        return self(r)
