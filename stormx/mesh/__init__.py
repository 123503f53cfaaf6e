from stormx.mesh import shapes
from stormx.mesh.refine import refine
from stormx.mesh.structured import structured_tet_box, structured_tri_rect
from stormx.mesh.tetgen import read_tetgen
from stormx.mesh.unstructured import (
    DeviceMesh,
    UnstructuredMesh,
    build_hybrid_mesh,
    build_mesh,
)

__all__ = [
    "shapes",
    "read_tetgen",
    "DeviceMesh",
    "UnstructuredMesh",
    "build_mesh",
    "build_hybrid_mesh",
    "structured_tri_rect",
    "structured_tet_box",
    "refine",
]
