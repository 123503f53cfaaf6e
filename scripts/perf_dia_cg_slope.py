"""Settle the Pallas-DIA question (VERDICT r2 #5): slope-protocol CG-step
comparison, XLA DIA vs the fused Pallas kernels.

Chains K data-dependent CG iterations inside ONE jit (lax.fori_loop over
the (x, r, p, γ) carry — every iteration depends on the previous, so the
device cannot overlap or elide them), at K ∈ {50, 200, 800}; the per-step
time is the slope between chain lengths, which cancels the relay's
dispatch floor.  Fresh inputs per timed run defeat relay memoization.

The operator is the headline 4.2M-row 5-diagonal Poisson (bench.py).

Usage: timeout 560 python scripts/perf_dia_cg_slope.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    from jax import lax

    from bench import NX, poisson5_diags
    from stormx.ops.math import safe_divide
    from stormx.ops.pallas_dia import cg_step
    from stormx.sparse.formats import DIA

    offsets, data = poisson5_diags(NX)
    n = NX * NX
    dia = DIA(
        data=jnp.asarray(data),
        offsets=tuple(int(o) for o in offsets),
        shape=(n, n),
    )

    def xla_step(x, r, p, gamma):
        z = dia.matvec(p)
        pz = jnp.vdot(p, z)
        alpha = safe_divide(gamma, pz)
        x = x + alpha * p
        r = r - alpha * z
        rr = jnp.vdot(r, r)
        beta = safe_divide(rr, gamma)
        p = r + beta * p
        return x, r, p, rr

    def pallas_step(x, r, p, gamma):
        return cg_step(dia, x, r, p, gamma)

    def chain(step, reps):
        def run(b):
            x0 = jnp.zeros_like(b)
            gamma = jnp.vdot(b, b)
            carry = (x0, b, b, gamma)
            carry = lax.fori_loop(
                0, reps, lambda i, c: step(*c), carry
            )
            return carry[0]

        return jax.jit(run)

    reps_list = (
        tuple(int(r) for r in sys.argv[1:]) if len(sys.argv) > 1 else (50, 200, 800)
    )
    print(f"operator ready (n={n}); reps={reps_list}", flush=True)
    rng = np.random.default_rng(11)
    results = {}
    for name, step in (("xla", xla_step), ("pallas", pallas_step)):
        times = {}
        for reps in reps_list:
            c = chain(step, reps)
            bw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            bw.block_until_ready()
            print(f"  {name} reps={reps}: compiling...", flush=True)
            c(bw).block_until_ready()  # compile + warm
            best = np.inf
            for _ in range(3):
                bt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
                bt.block_until_ready()
                t0 = time.perf_counter()
                c(bt).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
            print(f"  {name} reps={reps}: {best:.4f}s", flush=True)
        rs = sorted(times)
        slopes = [
            (times[b] - times[a]) / (b - a) for a, b in zip(rs, rs[1:])
        ]
        results[name] = slopes[-1]
        print(
            f"{name:7s} slopes "
            + "  ".join(
                f"({a}→{b}) {s * 1e6:8.1f} us/iter"
                for (a, b), s in zip(zip(rs, rs[1:]), slopes)
            ),
            flush=True,
        )
    print(
        f"pallas/xla step ratio (last slopes): "
        f"{results['xla'] / results['pallas']:.3f}x"
    )


if __name__ == "__main__":
    main()
