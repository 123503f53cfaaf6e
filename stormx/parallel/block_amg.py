"""Distributed gather-free block AMG for banded (DIA) operators —
**bit-exact** across partition counts.

:class:`~stormx.precond.block_amg.BlockDiaAmg` aggregates ``g``
consecutive rows, so when shard boundaries are forced onto multiples of
``g`` (``partition_dia(..., align=g)``) NO aggregate ever straddles a
shard and every V-cycle ingredient is shard-local or an exact collective:

* smoothing     — weighted Jacobi through the halo-exchanging
  :meth:`PartitionedDIA.local_matvec` (per-row sums in the same diagonal
  order as the serial DIA matvec → bit-identical rows);
* restriction   — ``r.reshape(n_loc/g, g).sum(1)`` PER SHARD (same g
  addends, same order as serial — no psum at all);
* prolongation  — ``jnp.repeat`` per shard;
* coarse levels — distributed as long as the halo fits and ``g`` still
  divides the local block, then ONE ``all_gather`` (an exact concat) and
  the remaining serial hierarchy applied REPLICATED on every shard.

Because the only collectives are ppermute halos (exact neighbor copies)
and one all_gather (exact concat), the preconditioner output is
**bit-identical for every P** — unlike :class:`~stormx.parallel.amg.
DistributedAmg`, whose restriction psum perturbs the V-cycle to ~1e-7.
Outer CG histories therefore match across P to plain-CG's ~1e-13
dot-psum-regrouping contract (tested in tests/test_distributed_amg.py).

Reference parity: AMG is *Planned* in the reference (``README.md:71-82``)
and nothing distributed exists there; this is the TPU-first realization
(SURVEY §5 halo/collective design).
"""

from __future__ import annotations

import numpy as np

from stormx.precond.block_amg import BlockDiaAmg, prolong_repeat, restrict_sum

__all__ = ["DistributedBlockDiaAmg"]


class DistributedBlockDiaAmg:
    """Host-built factors for the distributed block-DIA V-cycle.

    ``dia``: the GLOBAL operator; ``pdia``: the
    :class:`~stormx.parallel.banded.PartitionedDIA` the solve will run
    with — build it with ``partition_dia(dia, P, align=group)`` so shard
    boundaries align with aggregates (validated here).

    Pass to :func:`stormx.parallel.banded.sharded_dia_solve` as
    ``amg=<this>``.
    """

    def __init__(self, dia, pdia, *, group: int = 4, num_sweeps: int = 1,
                 omega: float = 2.0 / 3.0, coarse_size: int = 256,
                 max_levels: int = 16):
        import jax.numpy as jnp

        from stormx.parallel.banded import PartitionedDIA

        g = int(group)
        if pdia.n_loc % g:
            raise ValueError(
                f"shard size {pdia.n_loc} not a multiple of group {g}; "
                f"build the partition with partition_dia(dia, P, align={g})"
            )
        # The serial hierarchy defines every level operator and the dense
        # coarse factor; the distributed apply reuses its coarse tail
        # verbatim, so P=1 and P>1 applies agree bit-for-bit.
        self.serial = BlockDiaAmg(
            dia, group=g, num_sweeps=num_sweeps, omega=omega,
            coarse_size=coarse_size, max_levels=max_levels,
        )
        self.group = g
        self.num_sweeps = num_sweeps
        self.omega = omega
        self.num_parts = Pn = pdia.num_parts

        # Distribute levels greedily: level k runs sharded with
        # n_loc_k = n_loc_0 / g^k while (a) the band halo fits one
        # neighbor block and (b) g still divides the local block (so the
        # NEXT restriction stays shard-local).  The first level that
        # fails becomes the replicated entry point.
        self.pdias: list[PartitionedDIA] = []
        n_loc = pdia.n_loc
        for lvl in self.serial._levels:
            op = lvl["op"]
            h = max(abs(int(o)) for o in op.offsets)
            if n_loc % g or h > n_loc:
                break
            D = op.num_diags
            data = np.asarray(op.data)
            n_k = lvl["n"]
            if Pn * n_loc != n_k:
                data = np.pad(data, ((0, 0), (0, Pn * n_loc - n_k)))
            data = data.reshape(D, Pn, n_loc).transpose(1, 0, 2)
            self.pdias.append(
                PartitionedDIA(
                    num_parts=Pn, n_global=n_k, n_loc=n_loc, h=h,
                    offsets=tuple(int(o) for o in op.offsets),
                    data=jnp.asarray(data),
                )
            )
            n_loc //= g
        if not self.pdias:
            raise ValueError(
                "no level is distributable (halo exceeds the local block "
                "even at the finest level); use fewer parts"
            )
        self.dist_depth = len(self.pdias)
        # n_loc of the REPLICATED entry residual (one restriction below
        # the last distributed level).
        self._n_loc_entry = self.pdias[-1].n_loc // g

        # Per-shard inv_diag stacks, padded like the data.
        self._idiag = []
        for k, pd in enumerate(self.pdias):
            idiag = np.asarray(self.serial._levels[k]["inv_diag"])
            idiag = np.pad(idiag, (0, Pn * pd.n_loc - idiag.shape[0]))
            self._idiag.append(
                jnp.asarray(idiag.reshape(Pn, pd.n_loc))
            )

    def extras(self) -> dict:
        """Per-shard arrays for sharded_dia_solve's extras plumbing."""
        out = {}
        for k, pd in enumerate(self.pdias):
            out[f"bamg_data{k}"] = pd.data
            out[f"bamg_idiag{k}"] = self._idiag[k]
        return out

    def make_apply(self, vals: dict, axis_name: str):
        """Build the local V-cycle closure (inside shard_map).

        ``vals``: ``{k: (data_loc (D_k, n_loc_k), idiag_loc (n_loc_k,))}``
        recovered from :meth:`extras` by the solve driver.
        """
        import jax.numpy as jnp
        from jax import lax

        g, omega, sweeps = self.group, self.omega, self.num_sweeps
        serial, K, Pn = self.serial, self.dist_depth, self.num_parts
        matvecs = [pd.local_matvec(axis_name) for pd in self.pdias]
        n_entry = (
            serial._levels[K]["n"] if K < len(serial._levels)
            else serial._coarse_inv.shape[0]
        )
        n_loc_entry = self._n_loc_entry

        def smooth(x, b, mv, idiag, *, from_zero=False):
            nloops = sweeps
            if from_zero:
                x = omega * idiag * b  # skip the matvec of zeros
                nloops -= 1
            for _ in range(nloops):
                x = x + omega * idiag * (b - mv(x))
            return x

        def vcycle(k, b_loc):
            if k == K:
                # Exact concat; every shard then runs the identical
                # serial coarse tail (replicated, small).
                full = lax.all_gather(b_loc, axis_name, tiled=True)
                e = serial._vcycle(K, full[:n_entry])
                e = jnp.pad(e, (0, Pn * n_loc_entry - n_entry))
                i = lax.axis_index(axis_name)
                return lax.dynamic_slice(
                    e, (i * n_loc_entry,), (n_loc_entry,)
                )
            data, idiag = vals[k]
            mv = lambda x: matvecs[k](x, data)
            x = smooth(None, b_loc, mv, idiag, from_zero=True)
            r = b_loc - mv(x)
            n_loc = r.shape[0]
            # MXU restriction/prolongation (see stormx.precond.block_amg);
            # shard-local because aggregate boundaries never straddle
            # shards (g | n_loc, validated at build).
            r_c = restrict_sum(r, n_loc // g, g)
            e_c = vcycle(k + 1, r_c)
            x = x + prolong_repeat(e_c, n_loc, g)
            return smooth(x, b_loc, mv, idiag)

        return lambda r: vcycle(0, r)
