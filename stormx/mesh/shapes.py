"""Element shape catalog: vectorized volume / barycenter / normal geometry.

Reference: ``Mallard/Shape.hpp:39-858`` — 8 shape types (Seg, Triangle,
Quadrangle, TriangleStrip, Polygon, Tetrahedron, Pyramid, Pentahedron,
Hexahedron), each carrying node lists and generic geometry computed by
decomposing complex shapes into simplex ``pieces`` and accumulating
volume-weighted barycenters (``Shape.hpp:141-199``).

TPU-native re-design: no per-shape objects.  Geometry functions take
``coords`` of shape ``(..., num_nodes, dim)`` (all cells of one shape type at
once — a hybrid mesh groups cells by type, SURVEY §7 hard-part 5) and return
batched volumes/centers/normals.  Everything is plain ``numpy``-compatible
``jnp`` math, usable both host-side (mesh build) and device-side.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "SEG",
    "TRIANGLE",
    "QUADRANGLE",
    "TETRAHEDRON",
    "PYRAMID",
    "PENTAHEDRON",
    "HEXAHEDRON",
    "SHAPE_FACES_2D",
    "SHAPE_FACES_3D",
    "SHAPE_EDGES_3D",
    "volume",
    "barycenter",
    "face_normal_2d",
    "face_normal_3d",
]

# Shape type ids (order mirrors the reference catalog).
SEG = 1
TRIANGLE = 2
QUADRANGLE = 3
TETRAHEDRON = 4
PYRAMID = 5
PENTAHEDRON = 6
HEXAHEDRON = 7

_NUM_NODES = {
    SEG: 2,
    TRIANGLE: 3,
    QUADRANGLE: 4,
    TETRAHEDRON: 4,
    PYRAMID: 5,
    PENTAHEDRON: 6,
    HEXAHEDRON: 8,
}

# Faces (as local node index tuples) of 2D cells — their "faces" are edges
# (reference ``Mallard/Fwd.hpp``: Face = rank TopoDim−1 entity).
SHAPE_FACES_2D = {
    TRIANGLE: [(0, 1), (1, 2), (2, 0)],  # Shape.hpp:278-334
    QUADRANGLE: [(0, 1), (1, 2), (2, 3), (3, 0)],  # Shape.hpp:353-392
}

# Faces of 3D cells (outward-ordered), reference Shape.hpp:559-854.
SHAPE_FACES_3D = {
    TETRAHEDRON: [(0, 2, 1), (0, 1, 3), (1, 2, 3), (2, 0, 3)],
    PYRAMID: [(0, 3, 2, 1), (0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4)],
    PENTAHEDRON: [(0, 1, 4, 3), (1, 2, 5, 4), (2, 0, 3, 5), (0, 2, 1), (3, 4, 5)],
    HEXAHEDRON: [
        (0, 3, 2, 1),
        (0, 1, 5, 4),
        (1, 2, 6, 5),
        (2, 3, 7, 6),
        (0, 4, 7, 3),
        (4, 5, 6, 7),
    ],
}

# Edges (local node index pairs) of 3D cells, reference Shape.hpp:559-854
# (``edges()`` lists of each shape).
SHAPE_EDGES_3D = {
    TETRAHEDRON: [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)],
    PYRAMID: [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (0, 4), (1, 4), (2, 4), (3, 4),
    ],
    PENTAHEDRON: [
        (0, 1), (1, 2), (2, 0),
        (3, 4), (4, 5), (5, 3),
        (0, 3), (1, 4), (2, 5),
    ],
    HEXAHEDRON: [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
}

# Simplex decompositions ("pieces", reference Shape.hpp:410-528) for volume /
# barycenter of non-simplex cells.
_TET_PIECES = {
    PYRAMID: [(0, 1, 2, 4), (0, 2, 3, 4)],
    PENTAHEDRON: [(0, 1, 2, 4), (0, 2, 5, 4), (0, 3, 4, 5)],
    HEXAHEDRON: [  # six positively-oriented tets sharing diagonal 0–6
        (0, 1, 2, 6),
        (0, 2, 3, 6),
        (0, 3, 7, 6),
        (0, 7, 4, 6),
        (0, 4, 5, 6),
        (0, 5, 1, 6),
    ],
}
_TRI_PIECES = {QUADRANGLE: [(0, 1, 2), (0, 2, 3)]}


def _tri_area(coords):
    """Signed area (2D) or unsigned area (3D) of triangles (..., 3, dim)."""
    a = coords[..., 1, :] - coords[..., 0, :]
    b = coords[..., 2, :] - coords[..., 0, :]
    if coords.shape[-1] == 2:
        return 0.5 * (a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0])
    cr = np.cross(a, b)
    return 0.5 * np.linalg.norm(cr, axis=-1)


def _tet_volume(coords):
    """Signed volume of tetrahedra (..., 4, 3)."""
    a = coords[..., 1, :] - coords[..., 0, :]
    b = coords[..., 2, :] - coords[..., 0, :]
    c = coords[..., 3, :] - coords[..., 0, :]
    return np.einsum("...i,...i->...", np.cross(a, b), c) / 6.0


def volume(shape_type: int, coords):
    """Cell measure: length (Seg) / area (2D) / volume (3D).

    2D areas are *signed* (positive for CCW node order), so the mesh builder
    can detect and fix inverted cells — the analog of the reference's
    orientation handling (``MeshUnstructured.hpp:509-554``).
    """
    if shape_type == SEG:
        return np.linalg.norm(coords[..., 1, :] - coords[..., 0, :], axis=-1)
    if shape_type == TRIANGLE:
        return _tri_area(coords)
    if shape_type == QUADRANGLE:
        return sum(_tri_area(coords[..., list(p), :]) for p in _TRI_PIECES[QUADRANGLE])
    if shape_type == TETRAHEDRON:
        return _tet_volume(coords)
    if shape_type in _TET_PIECES:
        return sum(_tet_volume(coords[..., list(p), :]) for p in _TET_PIECES[shape_type])
    raise ValueError(f"unknown shape type {shape_type}")


def barycenter(shape_type: int, coords):
    """Volume-weighted barycenter (reference ``Shape.hpp:158-181``)."""
    if shape_type in (SEG, TRIANGLE, TETRAHEDRON):
        return coords.mean(axis=-2)
    if shape_type == QUADRANGLE:
        pieces = _TRI_PIECES[QUADRANGLE]
        meas, cent = _tri_area, None
    elif shape_type in _TET_PIECES:
        pieces = _TET_PIECES[shape_type]
        meas = _tet_volume
    else:
        raise ValueError(f"unknown shape type {shape_type}")
    vols = [meas(coords[..., list(p), :]) for p in pieces]
    cents = [coords[..., list(p), :].mean(axis=-2) for p in pieces]
    total = sum(vols)
    weighted = sum(v[..., None] * c for v, c in zip(vols, cents))
    return weighted / total[..., None]


def face_normal_2d(coords):
    """Unit normal of 2D faces (segments), (..., 2, 2) → (..., 2).

    Convention: for a segment (a → b), n = perp(b − a) = (dy, −dx)/‖·‖, i.e.
    rotated −90°; with CCW cell orientation this points *out* of the cell
    whose traversal is a → b (the inner cell).
    """
    d = coords[..., 1, :] - coords[..., 0, :]
    n = np.stack([d[..., 1], -d[..., 0]], axis=-1)
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


def face_normal_3d(coords):
    """Area-weighted unit normal of 3D polygon faces (..., k, 3) → (..., 3).

    Newell accumulation over the polygon fan — matches the reference's
    piecewise normal accumulation (``Shape.hpp:183-199``).
    """
    k = coords.shape[-2]
    acc = 0.0
    for i in range(1, k - 1):
        a = coords[..., i, :] - coords[..., 0, :]
        b = coords[..., i + 1, :] - coords[..., 0, :]
        acc = acc + 0.5 * np.cross(a, b)
    return acc / np.linalg.norm(acc, axis=-1, keepdims=True)


def num_nodes(shape_type: int) -> int:
    return _NUM_NODES[shape_type]
