"""Micro-benchmark TPU gather primitives (f32) — the design input for the
unstructured SpMV fast path: how does gather throughput scale with row
width, sortedness, and how much does MXU precision cost the windowed-dense
path?  Chained inside one jit with a traced rep count (see
perf_unstructured.py for the protocol rationale).
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEADLINE_S = int(os.environ.get("STORMX_BENCH_DEADLINE_S", "540"))
threading.Thread(
    target=lambda: (time.sleep(_DEADLINE_S), os._exit(2)), daemon=True
).start()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    N = 79672  # step-mesh scale
    rng = np.random.default_rng(0)

    cases = {}

    # Scalar gather: permutation (chainable), random and sorted-ish.
    perm = rng.permutation(N).astype(np.int32)
    cases["scalar_perm"] = (jnp.asarray(rng.standard_normal(N).astype(np.float32)),
                            jnp.asarray(perm), N, {})
    cases["scalar_perm_sorted_hint"] = (
        cases["scalar_perm"][0], jnp.asarray(perm), N,
        {"unique_indices": True},
    )

    for w in (8, 128):
        m = N // w
        permr = rng.permutation(m).astype(np.int32)
        cases[f"rows{w}_perm"] = (
            jnp.asarray(rng.standard_normal((m, w)).astype(np.float32)),
            jnp.asarray(permr), m * w, {},
        )

    results = {}
    for name, (x0, idx, elems, kw) in cases.items():
        def step(v, idx=idx, kw=kw):
            return jnp.take(v, idx, axis=0, **kw) * np.float32(0.999)

        @jax.jit
        def chain(v, reps):
            return lax.fori_loop(0, reps, lambda _, v: step(v), v)

        chain(x0, 4).block_until_ready()
        t0 = time.perf_counter(); chain(x0 * 1.1, 200).block_until_ready()
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); chain(x0 * 1.2, 1000).block_until_ready()
        t_hi = time.perf_counter() - t0
        per = (t_hi - t_lo) / 800
        results[name] = per
        print(json.dumps({
            "metric": f"gather_{name}",
            "per_rep_us": per * 1e6,
            "gathers_per_s": (elems / idx.shape[0] and idx.shape[0]) / per,
            "elems_per_s": elems / per,
        }), flush=True)

    # MXU precision cost for the windowed-dense path (batched einsum).
    nb, R, C = 623, 128, 768
    A = jnp.asarray(rng.standard_normal((nb, R, C)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((nb, C)).astype(np.float32))
    for prec in ("default", "highest"):
        p = jax.lax.Precision.DEFAULT if prec == "default" else jax.lax.Precision.HIGHEST

        @jax.jit
        def chain_mm(w, reps, p=p):
            def body(_, w):
                y = jnp.einsum("brc,bc->br", A, w, precision=p)
                # fold back to (nb, C) to keep the chain same-shaped
                return jnp.tile(y, (1, C // R)) * np.float32(0.01)
            return lax.fori_loop(0, reps, body, w)

        chain_mm(W, 4).block_until_ready()
        t0 = time.perf_counter(); chain_mm(W * 1.1, 64).block_until_ready()
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); chain_mm(W * 1.2, 320).block_until_ready()
        t_hi = time.perf_counter() - t0
        per = (t_hi - t_lo) / 256
        print(json.dumps({
            "metric": f"windowed_dense_einsum_{prec}",
            "per_rep_us": per * 1e6,
            "effective_GBps": nb * R * C * 4 / per / 1e9,
        }), flush=True)


if __name__ == "__main__":
    main()
