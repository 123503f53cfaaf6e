"""TriangleStrip / Polygon shape support (reference ``Shape.hpp:410-528``;
``Polygon::pieces`` and ``TriangleStrip::edges`` are unimplemented stubs
there — stormx completes them)."""

import numpy as np

from stormx.mesh import shapes
from stormx.mesh.unstructured import build_hybrid_mesh


def regular_polygon(k, r=1.0):
    th = 2 * np.pi * np.arange(k) / k
    return np.stack([r * np.cos(th), r * np.sin(th)], axis=1)


class TestPolygon:
    def test_area_and_barycenter_regular(self):
        for k in (5, 6, 8, 12):
            coords = regular_polygon(k)[None]  # batch of 1
            area = shapes.volume(shapes.POLYGON, coords)[0]
            exact = 0.5 * k * np.sin(2 * np.pi / k)
            assert abs(area - exact) < 1e-12
            c = shapes.barycenter(shapes.POLYGON, coords)[0]
            np.testing.assert_allclose(c, [0.0, 0.0], atol=1e-12)

    def test_faces_close_the_loop(self):
        # The reference's Polygon::edges omits the closing edge
        # (Shape.hpp:512-518); ours must include it.
        faces = shapes.polygon_faces(6)
        assert len(faces) == 6
        assert (5, 0) in faces

    def test_fallbacks(self):
        assert shapes.normalize_shape(shapes.POLYGON, 3) == shapes.TRIANGLE
        assert shapes.normalize_shape(shapes.POLYGON, 4) == shapes.QUADRANGLE
        assert shapes.normalize_shape(shapes.TRIANGLE_STRIP, 3) == shapes.TRIANGLE
        # 4-node strips must NOT collapse to quads (zig-zag ≠ boundary order).
        assert (
            shapes.normalize_shape(shapes.TRIANGLE_STRIP, 4)
            == shapes.TRIANGLE_STRIP
        )


class TestTriangleStrip:
    def test_area_matches_triangle_sum(self):
        # A strip over a unit-square grid: nodes zig-zag bottom/top.
        rng = np.random.default_rng(0)
        k = 8
        xs = np.sort(rng.random(k // 2) * 4)
        bottom = np.stack([xs, np.zeros(k // 2)], 1)
        top = np.stack([xs + 0.1, np.ones(k // 2)], 1)
        coords = np.empty((k, 2))
        coords[0::2] = bottom
        coords[1::2] = top
        area = shapes.volume(shapes.TRIANGLE_STRIP, coords[None])[0]
        tri_sum = sum(
            abs(shapes.volume(shapes.TRIANGLE, coords[list(p)][None])[0])
            for p in shapes.strip_pieces(k)
        )
        assert abs(abs(area) - tri_sum) < 1e-12

    def test_perimeter_is_one_cycle(self):
        for k in (5, 6, 9):
            faces = shapes.strip_faces(k)
            assert len(faces) == k
            # Every node appears exactly once as source and once as target.
            src = sorted(f[0] for f in faces)
            dst = sorted(f[1] for f in faces)
            assert src == list(range(k)) and dst == list(range(k))


class TestPolygonMesh:
    def test_hexagon_honeycomb_poisson(self):
        # Small honeycomb patch: a hexagon ring around a center hexagon —
        # checks face dedup across polygon cells + solver on the operator.
        import jax.numpy as jnp

        from stormx.fvm.divgrad import assemble_divgrad
        from stormx.solvers import cg, make_operator

        # Hex centers in axial layout.
        centers = [(0.0, 0.0)]
        for i in range(6):
            th = np.pi / 3 * i + np.pi / 6
            centers.append((np.sqrt(3) * np.cos(th), np.sqrt(3) * np.sin(th)))
        nodes = {}
        cells = []
        for cx, cy in centers:
            ids = []
            for i in range(6):
                th = np.pi / 3 * i
                p = (round(cx + np.cos(th), 9), round(cy + np.sin(th), 9))
                ids.append(nodes.setdefault(p, len(nodes)))
            cells.append(ids)
        pos = np.array(sorted(nodes, key=nodes.get))
        mesh = build_hybrid_mesh(pos, [(np.array(cells), shapes.POLYGON)])
        assert mesh.num_cells == 7
        # 7 hexagons: center↔ring 6 shared edges + ring↔ring 6 more →
        # 42 − 12 = 30 unique faces, 12 interior, 18 on the perimeter.
        assert mesh.num_faces == 30
        assert len(mesh.interior_faces()) == 12
        assert len(mesh.boundary_faces()) == 18
        np.testing.assert_allclose(
            mesh.cell_volumes, 1.5 * np.sqrt(3.0), atol=1e-9
        )

        op = assemble_divgrad(mesh)
        b = jnp.asarray(np.linspace(-1, 1, 7))
        b = b - jnp.mean(b)
        res = cg(
            make_operator(op.matvec), b, jnp.zeros(7),
        )
        # div_grad on a closed patch is singular (constant nullspace); with a
        # mean-free RHS CG converges to a mean-free solution.
        assert bool(res.converged)
        r = np.asarray(op.matvec(res.x) - b)
        assert np.abs(r).max() < 1e-6
