"""Pallas DIA kernel correctness + timing vs XLA on the real chip.

Staged prints so a hang/crash localizes to the last printed stage.
Run: timeout 560 python scripts/perf_pallas.py [small|full|all]
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from stormx.sparse import DIA  # noqa: E402
from stormx.ops.pallas_dia import dia_spmv, dia_spmv_dots, cg_step  # noqa: E402


def banded(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    data = np.zeros((len(offsets), n), dtype=np.float32)
    for d, off in enumerate(offsets):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    return DIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n))


def stage(msg):
    print(msg, flush=True)


def small():
    n = 262144
    dia = banded(n, (-512, -1, 0, 1, 512))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n).astype(np.float32))
    stage("small: built")
    z_ref = dia.matvec(x)
    z_ref.block_until_ready()
    stage("small: xla ref done")
    z, pz = dia_spmv_dots(dia, x)
    err = float(jnp.max(jnp.abs(z - z_ref)))
    rel = float(abs(pz - jnp.vdot(x, z_ref)) / abs(jnp.vdot(x, z_ref)))
    stage(f"small: pallas err={err:.2e} pz_rel={rel:.2e}")
    assert err < 1e-3 and rel < 1e-4


def full():
    from bench import poisson5_diags, NX

    offsets, diag_np = poisson5_diags(NX)
    n = NX * NX
    dia = DIA(data=jnp.asarray(diag_np), offsets=offsets, shape=(n, n))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    REPS = 100
    stage("full: built")

    z_p = dia_spmv(dia, x)
    z_x = dia.matvec(x)
    stage(f"full: spmv err={float(jnp.max(jnp.abs(z_p - z_x))):.2e}")

    @jax.jit
    def chain_pallas(v):
        return lax.fori_loop(0, REPS, lambda _, v: dia_spmv(dia, v) * 0.125, v)

    chain_pallas(x).block_until_ready()
    stage("full: pallas chain compiled")
    t0 = time.perf_counter()
    chain_pallas(x).block_until_ready()
    dt = (time.perf_counter() - t0) / REPS
    stage(f"full: pallas spmv {dt*1e6:.0f} us (xla 249)")

    @jax.jit
    def cg_pallas(x, r, p, gamma):
        return lax.fori_loop(0, REPS, lambda _, c: cg_step(dia, *c), (x, r, p, gamma))

    r0 = b - dia.matvec(x)
    g0 = jnp.vdot(r0, r0)
    out = cg_pallas(x, r0, r0, g0)
    jax.block_until_ready(out)
    stage("full: cg chain compiled")
    t0 = time.perf_counter()
    out = cg_pallas(x, r0, r0, g0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    stage(f"full: pallas cg iter {dt*1e6:.0f} us (xla 428)")
    stage(f"full: gamma {float(out[3]):.4g} from {float(g0):.4g}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("small", "all"):
        small()
    if which in ("full", "all"):
        full()
