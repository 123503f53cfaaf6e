"""Mesh builder and TetGen reader tests.

Oracles: exact geometry of hand-built meshes, plus global invariants on the
reference's checked-in ``step`` mesh (40,303 nodes / 79,672 triangles,
``tests/_data/mesh/step.1.node:1``) — divergence theorem (Σ area·n over every
closed cell = 0) and Euler's formula.
"""

import numpy as np
import pytest

from stormx.mesh import build_mesh, read_tetgen, shapes

STEP_PREFIX = "/root/reference/tests/_data/mesh/step.1."


@pytest.fixture
def unit_square_two_tris():
    # Two CCW triangles forming the unit square.
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    cells = np.array([[0, 1, 2], [0, 2, 3]])
    return build_mesh(nodes, cells)


class TestShapes:
    def test_triangle_area(self):
        coords = np.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
        np.testing.assert_allclose(shapes.volume(shapes.TRIANGLE, coords), [0.5])

    def test_quad_area_and_center(self):
        coords = np.array([[[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [0.0, 1.0]]])
        np.testing.assert_allclose(shapes.volume(shapes.QUADRANGLE, coords), [2.0])
        np.testing.assert_allclose(
            shapes.barycenter(shapes.QUADRANGLE, coords), [[1.0, 0.5]]
        )

    def test_tet_volume(self):
        coords = np.array(
            [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]]
        )
        np.testing.assert_allclose(shapes.volume(shapes.TETRAHEDRON, coords), [1 / 6])

    def test_hex_volume_and_center(self):
        # Unit cube, standard node order.
        c = np.array(
            [
                [
                    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
                ]
            ],
            dtype=float,
        )
        np.testing.assert_allclose(shapes.volume(shapes.HEXAHEDRON, c), [1.0])
        np.testing.assert_allclose(
            shapes.barycenter(shapes.HEXAHEDRON, c), [[0.5, 0.5, 0.5]]
        )

    def test_pyramid_pentahedron_volume(self):
        pyr = np.array(
            [[[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 1.0]]],
            dtype=float,
        )
        np.testing.assert_allclose(shapes.volume(shapes.PYRAMID, pyr), [1 / 3])
        # Prism: unit right triangle extruded by 1.
        pent = np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 1], [0, 1, 1]]],
            dtype=float,
        )
        np.testing.assert_allclose(shapes.volume(shapes.PENTAHEDRON, pent), [0.5])

    def test_face_normal_2d(self):
        coords = np.array([[[0.0, 0.0], [1.0, 0.0]]])  # a → b along +x
        np.testing.assert_allclose(
            shapes.face_normal_2d(coords), [[0.0, -1.0]]
        )  # perp(b−a) = (dy, −dx)


class TestBuildMesh:
    def test_counts(self, unit_square_two_tris):
        m = unit_square_two_tris
        assert m.num_cells == 2
        assert m.num_faces == 5  # 4 boundary + 1 diagonal
        assert len(m.interior_faces()) == 1
        assert len(m.boundary_faces()) == 4

    def test_geometry(self, unit_square_two_tris):
        m = unit_square_two_tris
        np.testing.assert_allclose(m.cell_volumes, [0.5, 0.5])
        diag = m.interior_faces()[0]
        np.testing.assert_allclose(m.face_areas[diag], np.sqrt(2))

    def test_interior_face_connectivity(self, unit_square_two_tris):
        m = unit_square_two_tris
        diag = m.interior_faces()[0]
        assert set(m.face_cells[diag]) == {0, 1}
        assert (m.face_cells[m.boundary_faces(), 1] == -1).all()

    def test_normal_points_inner_to_outer(self, unit_square_two_tris):
        m = unit_square_two_tris
        f = m.interior_faces()[0]
        inner, outer = m.face_cells[f]
        d = m.cell_centers[outer] - m.cell_centers[inner]
        assert np.dot(m.face_normals[f], d) > 0

    def test_boundary_normals_outward(self, unit_square_two_tris):
        m = unit_square_two_tris
        for f in m.boundary_faces():
            inner = m.face_cells[f, 0]
            d = m.face_centers[f] - m.cell_centers[inner]
            assert np.dot(m.face_normals[f], d) > 0

    def test_divergence_theorem_per_cell(self, unit_square_two_tris):
        # Σ_faces area·n (outward) = 0 for each closed cell.
        m = unit_square_two_tris
        acc = np.zeros((m.num_cells, 2))
        for f in range(m.num_faces):
            inner, outer = m.face_cells[f]
            an = m.face_areas[f] * m.face_normals[f]
            acc[inner] += an
            if outer >= 0:
                acc[outer] -= an
        np.testing.assert_allclose(acc, 0.0, atol=1e-12)

    def test_cw_cells_fixed(self):
        # Clockwise input cell must be re-oriented, volume positive.
        nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        cells = np.array([[0, 2, 1]])  # CW
        m = build_mesh(nodes, cells)
        np.testing.assert_allclose(m.cell_volumes, [0.5])


class TestDeviceArrays:
    def test_cell_face_ell_signs(self, unit_square_two_tris):
        import jax.numpy as jnp

        m = unit_square_two_tris
        dm = m.device_arrays()
        # A flux that vanishes on the boundary telescopes: contributions of
        # the shared diagonal face cancel between the two cells.
        flux = np.zeros(m.num_faces)
        diag = m.interior_faces()[0]
        flux[diag] = 2.5
        per_cell = (jnp.asarray(flux)[dm.cell_face_ell] * dm.cell_face_sign).sum(
            axis=1
        )
        np.testing.assert_allclose(per_cell[0], -per_cell[1])
        np.testing.assert_allclose(np.abs(per_cell[0]), 2.5)
        # Every cell sees all 3 of its faces (sign ≠ 0 count).
        assert (np.asarray(dm.cell_face_sign != 0).sum(axis=1) == 3).all()

    def test_adjacency(self, unit_square_two_tris):
        m = unit_square_two_tris
        dm = m.device_arrays()
        adj = np.asarray(dm.cell_adj_ell)
        assert 1 in adj[0]
        assert 0 in adj[1]

    def test_face_dist(self, unit_square_two_tris):
        m = unit_square_two_tris
        dm = m.device_arrays()
        diag = m.interior_faces()[0]
        want = np.linalg.norm(m.cell_centers[1] - m.cell_centers[0])
        np.testing.assert_allclose(np.asarray(dm.face_dist)[diag], want)
        assert (np.asarray(dm.face_dist)[m.boundary_faces()] == 0).all()


@pytest.mark.slow
class TestStepMesh:
    def test_step_mesh_loads(self):
        m = read_tetgen(STEP_PREFIX)
        assert m.num_nodes == 40303  # step.1.node:1
        assert m.num_cells == 79672  # step.1.ele:1
        # Euler: V − E + F = 1 for a planar subdivision with one hole ≈ step
        # domain; don't over-assert, just sanity-check edge count from file.
        assert m.num_faces == 119974  # step.1.edge:1

    def test_step_divergence_theorem(self):
        m = read_tetgen(STEP_PREFIX)
        acc = np.zeros((m.num_cells, 2))
        an = m.face_areas[:, None] * m.face_normals
        np.add.at(acc, m.face_cells[:, 0], an)
        interior = m.face_cells[:, 1] >= 0
        np.add.at(acc, m.face_cells[interior, 1], -an[interior])
        np.testing.assert_allclose(acc, 0.0, atol=1e-10)

    def test_step_total_area(self):
        m = read_tetgen(STEP_PREFIX)
        assert m.cell_volumes.min() > 0
        # Step domain: [0,3]×[0,1] minus a 0.6×0.8 step ⇒ area 2.52.
        np.testing.assert_allclose(m.cell_volumes.sum(), 2.52, rtol=1e-6)

    def test_step_boundary_labeled(self):
        m = read_tetgen(STEP_PREFIX)
        assert len(m.boundary_faces()) > 0
        assert (m.face_labels[m.boundary_faces()] >= 1).all()
        assert (m.face_labels[m.interior_faces()] == 0).all()


def cube_tet_mesh(nx=3):
    """Unit cube, each voxel split into 6 tetrahedra (3D end-to-end fixture)."""
    xs = np.linspace(0, 1, nx + 1)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    nodes = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def nid(i, j, k):
        return (i * (nx + 1) + j) * (nx + 1) + k

    # 6-tet Kuhn subdivision of each cube.
    corners = lambda i, j, k: [
        nid(i, j, k), nid(i + 1, j, k), nid(i, j + 1, k), nid(i + 1, j + 1, k),
        nid(i, j, k + 1), nid(i + 1, j, k + 1), nid(i, j + 1, k + 1), nid(i + 1, j + 1, k + 1),
    ]
    KUHN = [(0, 1, 3, 7), (0, 1, 5, 7), (0, 2, 3, 7), (0, 2, 6, 7), (0, 4, 5, 7), (0, 4, 6, 7)]
    cells = []
    for i in range(nx):
        for j in range(nx):
            for k in range(nx):
                c = corners(i, j, k)
                for t in KUHN:
                    cells.append([c[v] for v in t])
    return build_mesh(nodes, np.asarray(cells))


class TestMesh3D:
    def test_build_and_geometry(self):
        m = cube_tet_mesh(2)
        assert m.dim == 3
        assert m.num_cells == 6 * 8
        # Total volume = 1, each boundary side has area 1 (6 sides).
        np.testing.assert_allclose(m.cell_volumes.sum(), 1.0, rtol=1e-12)
        boundary = m.boundary_faces()
        np.testing.assert_allclose(m.face_areas[boundary].sum(), 6.0, rtol=1e-12)

    def test_face_normals_outward(self):
        m = cube_tet_mesh(2)
        boundary = m.boundary_faces()
        centers = m.face_centers[boundary] - 0.5  # cube center at origin
        dots = np.einsum("ij,ij->i", m.face_normals[boundary], centers)
        assert (dots > 0).all()  # boundary normals point out of the domain

    def test_poisson_cg_3d(self):
        """3D end-to-end: CG on the div_grad operator of the tet mesh."""
        import jax.numpy as jnp

        from stormx.fvm.divgrad import div_grad
        from stormx.solvers import SolverOptions, cg, make_operator

        m = cube_tet_mesh(3)
        dmesh = m.device_arrays()
        rng = np.random.default_rng(0)
        b = rng.standard_normal(m.num_cells)
        b -= b.mean()  # pure-Neumann compatibility

        def op(x):
            # -divgrad + small shift to remove the nullspace
            return -div_grad(dmesh, jnp.zeros_like(x), 1.0, x) + 1e-3 * x

        res = cg(make_operator(op), jnp.asarray(b), jnp.zeros(m.num_cells),
                 options=SolverOptions(num_iterations=500))
        assert bool(res.converged)
        r = np.asarray(op(res.x)) - b
        assert np.abs(r).max() < 1e-5


class TestHybridMesh:
    """Mixed triangle + quadrangle mesh (reference hybrid-shape support)."""

    def _mesh(self):
        from stormx.mesh import build_hybrid_mesh

        # [0,2]x[0,1]: left unit square split into 2 triangles, right one quad.
        #  3 --- 4 --- 5
        #  |  \  |     |
        #  0 --- 1 --- 2
        nodes = np.array(
            [[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1]], dtype=float
        )
        tris = np.array([[0, 1, 3], [1, 4, 3]])
        quads = np.array([[1, 2, 5, 4]])
        return build_hybrid_mesh(nodes, [(tris, shapes.TRIANGLE), (quads, shapes.QUADRANGLE)])

    def test_geometry(self):
        m = self._mesh()
        assert m.num_cells == 3
        assert m.cell_shape == -1
        np.testing.assert_array_equal(
            m.cell_shapes, [shapes.TRIANGLE, shapes.TRIANGLE, shapes.QUADRANGLE]
        )
        np.testing.assert_allclose(m.cell_volumes, [0.5, 0.5, 1.0])
        np.testing.assert_allclose(m.cell_volumes.sum(), 2.0)
        # Boundary = outer perimeter (length 6), interior = 2 shared edges.
        boundary = m.boundary_faces()
        np.testing.assert_allclose(m.face_areas[boundary].sum(), 6.0)
        assert len(m.interior_faces()) == 2
        # Padded cell_nodes: triangles end with -1.
        assert m.cell_nodes.shape == (3, 4)
        assert (m.cell_nodes[:2, 3] == -1).all()

    def test_divgrad_solve(self, rng):
        import jax.numpy as jnp

        from stormx.fvm.divgrad import div_grad
        from stormx.solvers import SolverOptions, bicgstab, make_operator

        m = self._mesh()
        dmesh = m.device_arrays()
        b = rng.standard_normal(m.num_cells)

        # div_grad carries the 1/volume weighting, so with mixed cell
        # volumes the operator is nonsymmetric — use BiCGStab.
        def op(x):
            return -div_grad(dmesh, jnp.zeros_like(x), 1.0, x) + 0.1 * x

        res = bicgstab(make_operator(op), jnp.asarray(b), jnp.zeros(m.num_cells),
                       options=SolverOptions(num_iterations=100))
        assert bool(res.converged)
        assert np.abs(np.asarray(op(res.x)) - b).max() < 1e-6

    def test_mixed_arity_shared_face_dedup(self):
        """Regression: with mixed face arities (hex quads force tri-face key
        padding), a tri face shared by two tets that list its nodes in
        DIFFERENT orders must still deduplicate into one interior face.
        The old last-node-repeat padding ran before the sort, so the padded
        keys differed and the shared face silently split into two boundary
        faces (dropping the flux coupling)."""
        from stormx.mesh import build_hybrid_mesh

        nodes = np.array(
            [
                # Two tets sharing face {0, 1, 2}.
                [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                [0.2, 0.2, 1.0], [0.2, 0.2, -1.0],
                # A far-away unit cube (forces npf = 4 → tri faces padded).
                [10, 0, 0], [11, 0, 0], [11, 1, 0], [10, 1, 0],
                [10, 0, 1], [11, 0, 1], [11, 1, 1], [10, 1, 1],
            ],
            dtype=float,
        )
        tets = np.array([[0, 1, 2, 3], [2, 1, 0, 4]])  # shared face reordered
        hexes = np.array([[5, 6, 7, 8, 9, 10, 11, 12]])
        m = build_hybrid_mesh(
            nodes, [(tets, shapes.TETRAHEDRON), (hexes, shapes.HEXAHEDRON)]
        )
        # 4 + 4 − 1 tri faces + 6 hex quads.
        assert m.num_faces == 13
        interior = m.interior_faces()
        assert len(interior) == 1
        assert set(m.face_cells[interior[0]].tolist()) == {0, 1}
        # The shared face's node set survives (padding never leaks a −1).
        shared_nodes = set(m.face_nodes[interior[0]].tolist())
        assert shared_nodes == {0, 1, 2}


class TestMeshApi:
    """find-by-node-set and functional relabeling (reference
    MeshUnstructured.hpp:239-265 find, :443-500 permute/assign_labels)."""

    def test_find_face_and_cell(self, unit_square_two_tris):
        m = unit_square_two_tris
        diag = int(m.interior_faces()[0])
        assert m.find_face([2, 0]) == diag  # any node order
        assert m.find_face((0, 2)) == diag
        assert m.find_cell([3, 2, 0]) == 1
        assert m.find_face([0, 9]) is None
        assert m.find_cell([0, 1, 3]) is None

    def test_assign_face_labels(self, unit_square_two_tris):
        m = unit_square_two_tris
        labels = np.asarray(m.face_labels).copy()
        bottom = m.find_face([0, 1])
        labels[bottom] = 2
        m2 = m.assign_face_labels(labels)
        assert m2.num_labels == 3
        assert m2.num_faces_with_label(2) == 1
        f = m2.boundary_faces(2)[0]
        assert set(m2.face_nodes[f].tolist()) == {0, 1}
        # Geometry rides along with the permutation.
        np.testing.assert_allclose(m2.face_areas[f], 1.0)
        assert len(m2.interior_faces()) == 1
        # The relabeled mesh drives the FVM path (ghosts per label).
        from stormx.fvm.bc import far_field_bc, slip_bc
        from stormx.fvm.solver import FvSolver
        from stormx.apps.euler import initial_state

        dm = m2.device_arrays()
        u = initial_state(m2.num_cells)
        u2 = FvSolver(dm, order=1, bcs={1: far_field_bc, 2: slip_bc}).step(u, 1e-3)
        assert np.isfinite(np.asarray(u2)).all()

    def test_assign_face_labels_validates(self, unit_square_two_tris):
        from stormx.core.exceptions import StormError

        m = unit_square_two_tris
        labels = np.asarray(m.face_labels).copy()
        labels[int(m.interior_faces()[0])] = 1
        with pytest.raises(StormError, match="interior"):
            m.assign_face_labels(labels)
        with pytest.raises(StormError, match="one label per face"):
            m.assign_face_labels(labels[:-1])

    def test_node_labels_from_tetgen(self):
        m = read_tetgen(STEP_PREFIX)
        assert m.node_labels is not None
        assert m.node_labels.shape == (40303,)
        # The step geometry marks its boundary nodes with nonzero labels.
        assert (m.node_labels > 0).any()
        assert (m.node_labels >= 0).all()


class TestConnectivityTables:
    """The reference's (TopoDim+1)^2 adjacency matrix, derived lazily as CSR."""

    def test_edges_2d_equal_faces(self, ):
        m = read_tetgen(STEP_PREFIX) if False else None
        # structured tri mesh is enough
        import __graft_entry__ as g

        m = g._structured_tri_mesh(3, 3)
        e = m.edge_nodes()
        assert len(e) == m.num_faces  # 2D: edges are faces
        assert (e[:, 0] < e[:, 1]).all()

    def test_edges_3d_tet_count(self):
        m = cube_tet_mesh(1)  # 6 tets in one cube
        e = m.edge_nodes()
        # Kuhn subdivision of a cube: 8 corners, 12 cube edges + 6 face
        # diagonals + 1 body diagonal = 19 unique edges.
        assert len(e) == 19
        assert m.num_edges == 19

    def test_node_cells_csr(self):
        import __graft_entry__ as g

        m = g._structured_tri_mesh(2, 2)
        ptr, cols = m.node_cells_csr()
        assert ptr[-1] == (m.cell_nodes >= 0).sum()
        # Every cell appears exactly cell-node-count times.
        counts = np.bincount(cols, minlength=m.num_cells)
        np.testing.assert_array_equal(counts, (m.cell_nodes >= 0).sum(axis=1))

    def test_node_nodes_symmetric(self):
        import __graft_entry__ as g

        m = g._structured_tri_mesh(2, 2)
        ptr, cols = m.node_nodes_csr()
        rows = np.repeat(np.arange(m.num_nodes), np.diff(ptr))
        fwd = set(zip(rows.tolist(), cols.tolist()))
        assert all((c, r) in fwd for r, c in fwd)

    def test_cell_cells_matches_faces(self):
        import __graft_entry__ as g

        m = g._structured_tri_mesh(2, 2)
        ptr, cols = m.cell_cells_csr()
        assert ptr[-1] == 2 * len(m.interior_faces())

    def test_cell_faces_csr(self):
        m = cube_tet_mesh(1)
        ptr, cols = m.cell_faces_csr()
        np.testing.assert_array_equal(np.diff(ptr), np.full(m.num_cells, 4))  # tets


class TestHexMesh:
    """Hexahedral and mixed-face 3D meshes (quad + tri faces via padding)."""

    def _hex_grid(self, n):
        from stormx.mesh.unstructured import build_mesh

        xs = np.linspace(0.0, 1.0, n + 1)
        xx, yy, zz = np.meshgrid(xs, xs, xs, indexing="ij")
        pos = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
        s = n + 1

        def nid(i, j, k):
            return (i * s + j) * s + k

        cells = []
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    cells.append([
                        nid(i, j, k), nid(i + 1, j, k),
                        nid(i + 1, j + 1, k), nid(i, j + 1, k),
                        nid(i, j, k + 1), nid(i + 1, j, k + 1),
                        nid(i + 1, j + 1, k + 1), nid(i, j + 1, k + 1),
                    ])
        return build_mesh(pos, np.asarray(cells))

    def test_geometry_and_counts(self):
        n = 3
        mesh = self._hex_grid(n)
        assert mesh.num_cells == n**3
        # Structured grid: 3·n²·(n+1) faces total, 3·n²·(n−1) interior.
        assert mesh.num_faces == 3 * n * n * (n + 1)
        assert len(mesh.interior_faces()) == 3 * n * n * (n - 1)
        np.testing.assert_allclose(mesh.cell_volumes, (1.0 / n) ** 3, atol=1e-14)
        np.testing.assert_allclose(mesh.face_areas, (1.0 / n) ** 2, atol=1e-14)
        # Outward boundary normals.
        bf = mesh.boundary_faces()
        to_out = mesh.face_centers[bf] - mesh.cell_centers[mesh.face_cells[bf, 0]]
        dots = np.einsum("fd,fd->f", mesh.face_normals[bf], to_out)
        assert (dots > 0).all()

    def test_poisson_cg_on_hexes(self):
        import jax.numpy as jnp

        from stormx.fvm.divgrad import assemble_divgrad
        from stormx.solvers import cg, make_operator

        mesh = self._hex_grid(4)
        op = assemble_divgrad(mesh)
        rng = np.random.default_rng(0)
        b = rng.standard_normal(mesh.num_cells)
        b -= b.mean()
        res = cg(make_operator(op.matvec), jnp.asarray(b), jnp.zeros(mesh.num_cells))
        assert bool(res.converged)
        r = np.asarray(op.matvec(res.x)) - b
        assert np.abs(r).max() < 1e-6

    def test_pyramid_cells_mixed_faces(self):
        # One cube split into 6 pyramids sharing the center apex: tri + quad
        # faces in one mesh (the previously unsupported mixed-arity case).
        from stormx.mesh import shapes as sh
        from stormx.mesh.unstructured import build_hybrid_mesh

        corners = np.array([
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ], dtype=float)
        pos = np.vstack([corners, [[0.5, 0.5, 0.5]]])
        c = 8  # apex
        # Base quads ordered so the apex sees them CCW (outward from cube).
        bases = [
            (0, 3, 2, 1),  # bottom z=0
            (4, 5, 6, 7),  # top z=1
            (0, 1, 5, 4),  # y=0
            (2, 3, 7, 6),  # y=1
            (1, 2, 6, 5),  # x=1
            (3, 0, 4, 7),  # x=0
        ]
        cells = np.asarray([list(b) + [c] for b in bases])
        mesh = build_hybrid_mesh(pos, [(cells, sh.PYRAMID)])
        assert mesh.num_cells == 6
        # 6 quad boundary faces + 12 interior tri faces (each pair of
        # adjacent pyramids shares one).
        assert mesh.num_faces == 18
        assert len(mesh.interior_faces()) == 12
        np.testing.assert_allclose(mesh.cell_volumes, 1.0 / 6.0, atol=1e-12)
        np.testing.assert_allclose(mesh.cell_volumes.sum(), 1.0, atol=1e-12)


class TestRefine:
    """Uniform red refinement (stormx.mesh.refine) — the mesh-size scaling
    path the reference lacks (its largest problem is the 79,672-cell step,
    Playground.cpp:176-210)."""

    def test_triangle_counts_and_geometry(self):
        from stormx.mesh import refine, structured_tri_rect

        m = structured_tri_rect(5, 4)
        r = refine(m)
        assert r.num_cells == 4 * m.num_cells
        # Euler bookkeeping: every old face splits in 2, every cell adds 3
        # interior edges.
        assert r.num_faces == 2 * m.num_faces + 3 * m.num_cells
        np.testing.assert_allclose(
            r.cell_volumes.sum(), m.cell_volumes.sum(), rtol=1e-12
        )
        # Children are interleaved per parent: rows 4c..4c+3 partition
        # parent c's volume.
        np.testing.assert_allclose(
            r.cell_volumes.reshape(-1, 4).sum(1), m.cell_volumes, rtol=1e-12
        )
        assert (r.cell_volumes > 0).all()

    def test_boundary_labels_inherited_2d(self):
        from stormx.mesh import read_tetgen, refine

        m = read_tetgen("/root/reference/tests/_data/mesh/step.1.")
        r = refine(m)
        for lab in range(1, m.num_labels):
            assert r.num_faces_with_label(lab) == 2 * m.num_faces_with_label(lab)

    def test_tetrahedron_counts_and_geometry(self):
        from stormx.mesh import refine, structured_tet_box

        m = structured_tet_box(2, 2, 2)
        r = refine(m)
        assert r.num_cells == 8 * m.num_cells
        np.testing.assert_allclose(
            r.cell_volumes.reshape(-1, 8).sum(1), m.cell_volumes, rtol=1e-12
        )
        assert (r.cell_volumes > 0).all()
        # Boundary triangles split in 4.
        assert len(r.boundary_faces()) == 4 * len(m.boundary_faces())

    def test_poisson_error_decreases_under_refinement(self):
        """Discretization error of the FVM Laplacian halves order-2-ish under
        refinement — the end-to-end correctness oracle for the refined
        topology (wrong midpoint wiring would destroy convergence)."""
        from stormx.fvm.divgrad import assemble_laplacian
        from stormx.mesh import refine, structured_tri_rect
        from stormx.solvers import SolverOptions, cg, make_operator
        import jax.numpy as jnp

        errs = []
        m = structured_tri_rect(8, 8)
        for _ in range(2):
            # -∇²u = 2π² cos(πx) cos(πy): homogeneous-Neumann-compatible
            # (matches the no-flux Laplacian), zero-mean RHS; compare modulo
            # the constant nullspace.
            L = assemble_laplacian(m)
            csr = L.to_csr()
            xc, yc = m.cell_centers[:, 0], m.cell_centers[:, 1]
            u_exact = np.cos(np.pi * xc) * np.cos(np.pi * yc)
            f = 2 * np.pi**2 * u_exact * m.cell_volumes
            op = make_operator(csr.matvec)
            res = cg(
                op, jnp.asarray(f), jnp.zeros(m.num_cells),
                options=SolverOptions(absolute_tolerance=1e-12,
                                      relative_tolerance=1e-12),
            )
            u = np.asarray(res.x)
            V = m.cell_volumes
            u = u - (V * u).sum() / V.sum()
            ue = u_exact - (V * u_exact).sum() / V.sum()
            errs.append(float(np.sqrt((V * (u - ue) ** 2).sum())))
            m = refine(m)
        assert errs[1] < 0.4 * errs[0], errs
