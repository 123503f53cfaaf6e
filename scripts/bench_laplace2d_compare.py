"""Comparative Laplace2D benchmark — the reference's multi-library sweep.

The reference times the SAME 9-point Jacobi loop against Armadillo, Blaze,
Eigen, XTensor and NumPy (``tests/benchmark/BitternLaplace2D.cpp:359-395``,
``tests/benchmark/CMakeLists.txt:47-93``).  Those C++ libraries are not in
this image; the comparable array libraries that ARE baked in are NumPy and
torch (CPU).  This script runs the identical sweep (same init, stencil,
and golden final-sweep error) through:

* stormx — ``stormx.apps.laplace2d`` (one fused ``lax.fori_loop`` under
  jit), on whatever backend JAX selects (TPU here, CPU with
  ``STORMX_FORCE_CPU=1``);
* NumPy — vectorized slices, the reference's own Laplace2D_NumPy shape
  (``BitternLaplace2D.cpp:300-355``);
* torch — the same vectorized slices on CPU tensors.

Every implementation must reproduce the golden errors
(``BitternLaplace2D.cpp:403-422``: N=100 → 0.0069143, N=150 → 0.00994008,
N=200 → 0.0121789, double, 1000 iterations, tol 1e-4) — a cross-library
correctness anchor, not just a race.

Usage: timeout 560 python scripts/bench_laplace2d_compare.py [N ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = {100: 0.0069143, 150: 0.00994008, 200: 0.0121789}
ITERS = 1000


def _initial_np(n, xp):
    pi = np.pi
    x = xp.linspace(0.0, pi, n)
    u = xp.zeros((n, n), dtype=x.dtype)
    u[:, 0] = xp.sin(x)
    u[:, n - 1] = xp.sin(x) * np.exp(-pi)
    return u


def run_numpy(n, iters=ITERS):
    u = _initial_np(n, np)
    err = 0.0
    for _ in range(iters):
        edge = u[:-2, 1:-1] + u[2:, 1:-1] + u[1:-1, :-2] + u[1:-1, 2:]
        corner = u[:-2, :-2] + u[:-2, 2:] + u[2:, :-2] + u[2:, 2:]
        u_new = u.copy()
        u_new[1:-1, 1:-1] = (4.0 * edge + corner) / 20.0
        err = float(np.linalg.norm(u_new - u))
        u = u_new
    return err


def run_torch(n, iters=ITERS):
    import torch

    pi = np.pi
    x = torch.linspace(0.0, pi, n, dtype=torch.float64)
    u = torch.zeros((n, n), dtype=torch.float64)
    u[:, 0] = torch.sin(x)
    u[:, n - 1] = torch.sin(x) * np.exp(-pi)
    err = 0.0
    for _ in range(iters):
        edge = u[:-2, 1:-1] + u[2:, 1:-1] + u[1:-1, :-2] + u[1:-1, 2:]
        corner = u[:-2, :-2] + u[:-2, 2:] + u[2:, :-2] + u[2:, 2:]
        u_new = u.clone()
        u_new[1:-1, 1:-1] = (4.0 * edge + corner) / 20.0
        err = float(torch.linalg.norm(u_new - u))
        u = u_new
    return err


def main():
    sizes = [int(a) for a in sys.argv[1:]] or sorted(GOLDEN)

    if os.environ.get("STORMX_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    from stormx.apps.laplace2d import laplace2d

    backend = jax.default_backend()

    def run_stormx(n, iters=ITERS):
        _, err = laplace2d(n, iters)
        return float(err)

    impls = [("stormx-" + backend, run_stormx), ("numpy", run_numpy),
             ("torch-cpu", run_torch)]

    print(f"{'N':>4} {'library':14s} {'ms/run':>10s}  golden-error check")
    for n in sizes:
        for name, impl in impls:
            err = impl(n)  # warm (compile for stormx) + correctness
            if n in GOLDEN:
                assert abs(err - GOLDEN[n]) < 1e-4, (name, n, err)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                impl(n)
                best = min(best, time.perf_counter() - t0)
            tag = f"err={err:.7f} ≈ {GOLDEN[n]}" if n in GOLDEN else ""
            print(f"{n:4d} {name:14s} {best * 1e3:10.2f}  {tag}", flush=True)


if __name__ == "__main__":
    main()
