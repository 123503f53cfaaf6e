"""BASELINE.json config #5: incompressible NS pressure projection on a
partitioned mesh — IDR(s) vs BiCGStab(l) on the pressure Poisson solve."""

import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as g
from stormx.apps.navier_stokes import NsProjection, cell_divergence, flux_divergence
from stormx.solvers import SolverOptions


@pytest.fixture(scope="module")
def mesh():
    return g._structured_tri_mesh(12, 12)


def taylor_green(dmesh):
    """Divergence-free-in-the-continuum Taylor–Green field + a *removable*
    gradient pollution: ∇φ with φ = cos(πx)cos(πy), whose divergence is
    mean-free and whose normal derivative vanishes on the boundary — i.e.
    compatible with the closed-domain (Neumann) pressure Poisson problem.
    (A pollution with net boundary outflow, e.g. ∇(x²+y²), is provably
    unremovable by any projection on a closed domain.)"""
    xy = np.asarray(dmesh.cell_centers)
    x, y = xy[:, 0], xy[:, 1]
    u = np.sin(np.pi * x) * np.cos(np.pi * y)
    v = -np.cos(np.pi * x) * np.sin(np.pi * y)
    gx = -np.pi * np.sin(np.pi * x) * np.cos(np.pi * y)
    gy = -np.pi * np.cos(np.pi * x) * np.sin(np.pi * y)
    return jnp.asarray(np.stack([u + gx, v + gy], axis=1))


OPTS = SolverOptions(
    num_iterations=800, absolute_tolerance=1e-11, relative_tolerance=1e-11
)


class TestProjection:
    def test_projection_removes_divergence(self, mesh):
        ns = NsProjection(mesh, nu=1e-2, method="cg",
                          solver_kw={"options": OPTS})
        vel0 = taylor_green(ns.dmesh)
        vel1, p, res, flux1 = ns.step(vel0, dt=1e-2)
        assert bool(res.converged)
        d0 = np.abs(np.asarray(cell_divergence(ns.dmesh, vel0)))
        # The corrected FACE fluxes are divergence-free to solver tolerance,
        # up to the global Neumann compatibility constant (the discrete
        # boundary closure leaves an O(h²) net outflow no closed-domain
        # projection can remove; it appears as a CONSTANT divergence field).
        df = np.asarray(flux_divergence(ns.dmesh, flux1))
        assert np.abs(df - df.mean()).max() < 1e-7 * d0.max()
        assert np.abs(df.mean()) < 0.01 * d0.max()  # the O(h²) constant
        # The collocated cell velocities (LSQ corrector) are approximately
        # solenoidal — reduced, not eliminated.
        d1 = np.abs(np.asarray(cell_divergence(ns.dmesh, vel1)))
        assert np.median(d1) < 0.8 * np.median(d0)

    @pytest.mark.parametrize(
        "method",
        [pytest.param("idrs", marks=pytest.mark.slow), "bicgstab_l"],
    )
    def test_partitioned_pressure_solve(self, mesh, method):
        # The BASELINE config: distributed pressure Poisson via IDR(s) and
        # BiCGStab(l); both must converge and agree with the serial solve.
        serial = NsProjection(mesh, method=method, solver_kw={"options": OPTS})
        dist = NsProjection(
            mesh, method=method, num_parts=8, solver_kw={"options": OPTS}
        )
        vel0 = taylor_green(serial.dmesh)
        v_s, p_s, r_s, _ = serial.step(vel0, dt=1e-2)
        v_d, p_d, r_d, _ = dist.step(vel0, dt=1e-2)
        assert bool(r_s.converged) and bool(r_d.converged)
        np.testing.assert_allclose(np.asarray(p_d), np.asarray(p_s), atol=1e-7)
        np.testing.assert_allclose(np.asarray(v_d), np.asarray(v_s), atol=5e-6)

    def test_idrs_vs_bicgstabl_same_pressure(self, mesh):
        vel0 = None
        sols = {}
        for method in ("idrs", "bicgstab_l"):
            ns = NsProjection(
                mesh, method=method, num_parts=4, solver_kw={"options": OPTS}
            )
            if vel0 is None:
                vel0 = taylor_green(ns.dmesh)
            _, p, res, _ = ns.step(vel0, dt=1e-2)
            assert bool(res.converged), method
            sols[method] = np.asarray(p)
        np.testing.assert_allclose(
            sols["idrs"], sols["bicgstab_l"], atol=1e-6
        )

    def test_fully_sharded_step_matches_serial(self, mesh):
        # VERDICT r2 #4: the WHOLE projection step (predictor + divergence +
        # pressure solve + corrector) as one shard_map program.  Predictor,
        # divergence, and corrector are bit-exact vs serial; only the
        # pressure Krylov dots regroup (local-sum + psum), so agreement is
        # solver-tolerance-level.
        from stormx.parallel.ns import ShardedNsProjection

        serial = NsProjection(mesh, method="bicgstab_l",
                              solver_kw={"options": OPTS})
        vel0 = taylor_green(serial.dmesh)
        v_s, p_s, r_s, _ = serial.step(vel0, dt=1e-2)
        assert bool(r_s.converged)
        for parts in (1, 4, 8):
            dist = ShardedNsProjection(
                mesh, num_parts=parts, method="bicgstab_l",
                solver_kw={"options": OPTS},
            )
            v_d, p_d, r_d = dist.step(vel0, dt=1e-2)
            assert bool(r_d.converged), parts
            # p agrees at solver tolerance (the partitioned ELL sums rows in
            # a different order, so the Krylov trajectories differ at
            # rounding level); the LSQ corrector amplifies p noise by ~1/h.
            np.testing.assert_allclose(
                np.asarray(p_d), np.asarray(p_s), atol=1e-7, err_msg=f"P={parts}"
            )
            np.testing.assert_allclose(
                np.asarray(v_d), np.asarray(v_s), atol=5e-6, err_msg=f"P={parts}"
            )

    def test_fully_sharded_idrs_partition_invariant(self, mesh):
        # IDR(s) with the GLOBAL-layout shadow space at P=1 vs P=8.  Unlike
        # sharded_solve (fixed b ⇒ bit-identical histories), the in-step
        # mean reductions (rhs compatibility shift, p mean-shift) regroup
        # their summations with P, so the Poisson RHS itself differs at
        # ~1 ulp and IDR amplifies rounding like BiCGStab: the oracle is a
        # tight early history, matching stop behavior, and solver-tolerance
        # solutions.
        from stormx.parallel.ns import ShardedNsProjection

        vel0 = None
        out = {}
        for parts in (1, 8):
            dist = ShardedNsProjection(
                mesh, num_parts=parts, method="idrs",
                solver_kw={"options": OPTS},
            )
            if vel0 is None:
                vel0 = taylor_green(dist.dmesh)
            v_d, p_d, r_d = dist.step(vel0, dt=1e-2)
            assert bool(r_d.converged), parts
            out[parts] = (np.asarray(v_d), np.asarray(p_d),
                          np.asarray(r_d.history), int(r_d.num_iterations))
        assert abs(out[1][3] - out[8][3]) <= 2
        h1, h8 = out[1][2], out[8][2]
        rel = np.abs(h8[:10] - h1[:10]) / h1[:10]
        assert np.nanmax(rel) < 1e-9
        np.testing.assert_allclose(out[8][1], out[1][1], atol=1e-7)
        np.testing.assert_allclose(out[8][0], out[1][0], atol=5e-6)

    def test_distributed_step_jits(self, mesh):
        """Regression: the num_parts > 1 pressure solve called np.asarray on
        the rhs, raising TracerArrayConversionError under jit — the module
        docstring's 'Everything jits' claim now holds for the distributed
        path too."""
        import jax

        ns = NsProjection(mesh, method="cg", num_parts=4,
                          solver_kw={"options": OPTS})
        vel0 = taylor_green(ns.dmesh)

        @jax.jit
        def step(v):
            v1, p, res, _ = ns.step(v, dt=1e-2)
            return v1, p, res.converged

        v1, p, conv = step(vel0)
        assert bool(conv)
        assert np.isfinite(np.asarray(v1)).all()
        assert np.isfinite(np.asarray(p)).all()
