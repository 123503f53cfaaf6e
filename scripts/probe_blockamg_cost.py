"""Pinpoint the BlockDiaAmg V-cycle cost on chip: chain each ingredient
(fine matvec / restrict / prolong / smooth / full V-cycle) in one jit and
slope-time it.  Usage: timeout 560 python scripts/probe_blockamg_cost.py [nx] [g]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf_amg_tpu import poisson_dia  # noqa: E402


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    import jax.numpy as jnp
    from jax import lax

    from stormx.precond import BlockDiaAmg

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dia = poisson_dia(nx)
    n = nx * nx
    amg = BlockDiaAmg(dia, group=g, num_sweeps=1)
    lvl0 = amg._levels[0]
    nc = lvl0["nc"]

    from stormx.precond.block_amg import prolong_repeat, restrict_sum

    probes = {
        "fine_matvec": lambda r: dia.matvec(r),
        # naive 1-D reshape-sum/repeat: relayouts the whole vector onto an
        # 8-wide minor dim — measured 1.55 ms at 4.2M rows (r4)
        "restrict+prolong(naive)": lambda r: jnp.repeat(
            jnp.pad(r, (0, nc * g - n)).reshape(nc, g).sum(axis=1), g
        )[:n],
        # production path: lane-aligned MXU 0/1-matmul forms
        "restrict+prolong(mxu)": lambda r: prolong_repeat(
            restrict_sum(r, nc, g), n, g
        ),
        "smooth(zeros)": lambda r: amg._smooth(lvl0, jnp.zeros_like(r), r),
        "vcycle": lambda r: amg(r),
    }

    rng = np.random.default_rng(0)

    def chain(fn, reps):
        def body(_, r):
            # renormalize so the carry stays finite across reps
            r2 = fn(r)
            return r2 / jnp.maximum(jnp.linalg.norm(r2), 1e-30)

        return jax.jit(lambda r: lax.fori_loop(0, reps, body, r))

    for name, fn in probes.items():
        times = {}
        for reps in (50, 250):
            c = chain(fn, reps)
            rw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            rw.block_until_ready()
            c(rw).block_until_ready()  # compile+warm
            best = np.inf
            for _ in range(2):
                rt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
                rt.block_until_ready()
                t0 = time.perf_counter()
                c(rt).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        s = (times[250] - times[50]) / 200.0
        print(f"{name:18s} {s * 1e6:10.1f} us/apply", flush=True)


if __name__ == "__main__":
    main()
