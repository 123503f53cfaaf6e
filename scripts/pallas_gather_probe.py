"""Probe: does jnp.take_along_axis lower to tpu.dynamic_gather inside a
Pallas TPU kernel on this jax/Mosaic build?

Stage 1 (CPU, interpret): semantic check.
Stage 2 (TPU, compiled, SMALL): run in a sacrificial `timeout` process —
    a Mosaic fault can wedge the remote pool (CLAUDE.md).

Usage:
    python scripts/pallas_gather_probe.py interpret
    timeout 300 python scripts/pallas_gather_probe.py tpu
"""

import os
import sys

import numpy as np


def main(mode):
    import jax

    if mode == "interpret":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, L = 16, 128

    def kernel(x_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(
            x_ref[:, :], idx_ref[:, :], axis=1, mode="promise_in_bounds"
        )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((M, L)).astype(np.float32)
    idx = rng.integers(0, L, size=(M, L)).astype(np.int32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=(mode == "interpret"),
    )
    y = np.asarray(jax.jit(f)(jnp.asarray(x), jnp.asarray(idx)))
    expect = np.take_along_axis(x, idx, axis=1)
    err = np.abs(y - expect).max()
    print(f"{mode}: max err = {err}")
    assert err == 0.0, "MISMATCH"
    print(f"{mode}: PASS")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "interpret")
