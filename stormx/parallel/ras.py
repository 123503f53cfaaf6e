"""Restricted additive Schwarz (zero-overlap) ILU-class preconditioning for
distributed solves — the standard way to take the ILU/SGS family distributed
(BASELINE north star: "Jacobi/block-diagonal first, ILU-class later").

Each partition factorizes its OWNED diagonal block A_pp on the host
(ILU(0) or the SGS splitting) and applies M⁻¹r = blockdiag(A_pp)⁻¹-ish
locally inside shard_map — no communication in the apply.  This is
block-Jacobi with incomplete inner factorizations, a.k.a. RAS with zero
overlap: the preconditioned operator (and hence the convergence history)
DEPENDS on the partition count, unlike every other stormx preconditioner —
more partitions → weaker coupling → more iterations (tested/documented).

SGS blocks of an SPD operator are SPD, so CG stays safe; ILU(0) blocks are
nonsymmetric in general — use BiCGStab/GMRES (the reference's own guidance
for nonsymmetric preconditioning, ``README.md:71-82``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["build_ras_factors", "RAS_KEYS"]

# Operand order for threading the stacked factors through shard_map.
RAS_KEYS = (
    "ras_lr1", "ras_ec1", "ras_ev1", "ras_id1",
    "ras_lr2", "ras_ec2", "ras_ev2", "ras_id2",
    "ras_mid",
)


def _local_block_csr(data_p, cols_p, n_pad):
    """Owned-block CSR of one partition (foreign columns dropped), with an
    identity diagonal injected for empty padding rows."""
    K = data_p.shape[1]
    rows = np.repeat(np.arange(n_pad), K)
    cc = cols_p.reshape(-1)
    dd = data_p.reshape(-1)
    keep = (dd != 0) & (cc < n_pad)
    rows, cc, dd = rows[keep], cc[keep], dd[keep]
    has_diag = np.zeros(n_pad, dtype=bool)
    has_diag[rows[cc == rows]] = True
    add = np.nonzero(~has_diag)[0]
    rows = np.concatenate([rows, add])
    cc = np.concatenate([cc, add])
    dd = np.concatenate([dd, np.ones(len(add), dd.dtype)])
    order = np.lexsort((cc, rows))
    rows, cc, dd = rows[order], cc[order], dd[order]
    rp = np.zeros(n_pad + 1, dtype=np.int64)
    np.add.at(rp, rows + 1, 1)
    return np.cumsum(rp), cc.astype(np.int32), dd


def _pad_stack(factors, n_pad):
    """Stack per-part TriangularFactors into (P, ...) arrays (level counts
    and widths padded with the dump row n_pad → processed as no-ops)."""
    L = max(int(f.level_rows.shape[0]) for f in factors)
    W = max(int(f.level_rows.shape[1]) for f in factors)
    K = max(int(f.ell_cols.shape[1]) for f in factors)
    lr = np.full((len(factors), L, W), n_pad, dtype=np.int32)
    ec = np.zeros((len(factors), n_pad + 1, K), dtype=np.int32)
    ev = np.zeros((len(factors), n_pad + 1, K), dtype=np.asarray(factors[0].ell_vals).dtype)
    idg = np.zeros((len(factors), n_pad + 1), dtype=np.asarray(factors[0].inv_diag).dtype)
    for p, f in enumerate(factors):
        l, w = f.level_rows.shape
        lr[p, :l, :w] = np.asarray(f.level_rows)
        k = f.ell_cols.shape[1]
        ec[p, :, :k] = np.asarray(f.ell_cols)
        ev[p, :, :k] = np.asarray(f.ell_vals)
        idg[p] = np.asarray(f.inv_diag)
    return jnp.asarray(lr), jnp.asarray(ec), jnp.asarray(ev), jnp.asarray(idg)


def build_ras_factors(pop, kind: str = "ilu0") -> dict:
    """Host-factorize every partition's owned block; returns the stacked
    operand dict consumed by :func:`stormx.parallel.sharded_solve`.

    ``kind``: ``"ilu0"`` (nonsymmetric apply → BiCGStab/GMRES) or ``"sgs"``
    (SPD-preserving → CG-safe on SPD operators).
    """
    from stormx.precond.factorized import _split_triangles, ilu0_factorize
    from stormx.precond.triangular import build_triangular

    P, n_pad, _ = pop.data.shape
    data = np.asarray(pop.data)
    cols = np.asarray(pop.cols)
    f1s, f2s, mids = [], [], []
    for p in range(P):
        rp, cc, dd = _local_block_csr(data[p], cols[p], n_pad)
        if kind == "ilu0":
            lu = ilu0_factorize(rp, cc, dd, n_pad).astype(dd.dtype)
            lo, up, _ = _split_triangles(rp, cc, lu, n_pad)
            f1s.append(build_triangular(*lo, n_pad, lower=True, unit_diagonal=True))
            f2s.append(build_triangular(*up, n_pad, lower=False))
            mids.append(np.ones(n_pad, dtype=dd.dtype))
        elif kind == "sgs":
            lo, up, diag = _split_triangles(rp, cc, dd, n_pad)
            if np.any(diag == 0):
                raise ValueError("RAS-SGS needs nonzero block diagonals")
            f1s.append(build_triangular(*lo, n_pad, lower=True))
            f2s.append(build_triangular(*up, n_pad, lower=False))
            mids.append(diag)
        else:
            raise ValueError(f"unknown RAS kind {kind!r}")
    lr1, ec1, ev1, id1 = _pad_stack(f1s, n_pad)
    lr2, ec2, ev2, id2 = _pad_stack(f2s, n_pad)
    mid = jnp.asarray(np.stack(mids))
    return dict(zip(RAS_KEYS, (lr1, ec1, ev1, id1, lr2, ec2, ev2, id2, mid)))
