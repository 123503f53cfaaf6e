"""Mesh visualization — the Vulture replacement.

Reference: ``visualize_mesh`` (``Vulture/Visualizer.hpp:52-365``) renders
nodes/edges/cells with OpenGL.  Per SURVEY §2.7 the rebuild replaces the
GL stack with file export: :func:`stormx.io.write_vtk` for ParaView, and
this module for quick matplotlib renders of 2-D meshes and cell fields.
"""

from __future__ import annotations

import numpy as np

__all__ = ["visualize_mesh", "plot_cell_field", "plot_convergence"]


def _tri_split(mesh, with_cell_ids: bool = False):
    """Triangulate cells (quads → fan of triangles) for matplotlib.

    Handles hybrid meshes (−1-padded ``cell_nodes``): each cell emits
    (its node count − 2) fan triangles.  With ``with_cell_ids`` also
    returns the source cell of each triangle (for facecolor repetition).
    """
    cells = np.asarray(mesh.cell_nodes)
    npc = (cells >= 0).sum(axis=1)
    tris, ids = [], []
    for k in range(3, cells.shape[1] + 1):
        sel = npc >= k
        tris.append(cells[sel][:, [0, k - 2, k - 1]])
        ids.append(np.nonzero(sel)[0])
    tris = np.concatenate(tris, axis=0)
    ids = np.concatenate(ids)
    return (tris, ids) if with_cell_ids else tris


def visualize_mesh(mesh, path: str | None = None, *, show_edges: bool = True):
    """Render a 2-D mesh (wireframe + boundary highlighting) to ``path``.

    Returns the matplotlib figure (saves PNG when ``path`` given).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if mesh.dim != 2:
        raise NotImplementedError("visualize_mesh renders 2-D meshes; use VTK for 3-D")
    pos = np.asarray(mesh.node_positions)
    fig, ax = plt.subplots(figsize=(7, 7))
    if show_edges:
        ax.triplot(pos[:, 0], pos[:, 1], _tri_split(mesh), lw=0.3, color="0.6")
    # Boundary faces, colored by label.
    for label in range(1, mesh.num_labels):
        faces = mesh.boundary_faces(label)
        if not len(faces):
            continue
        fn = np.asarray(mesh.face_nodes)[faces]
        segs = pos[fn]  # (nf, 2, dim)
        for seg in segs:
            ax.plot(seg[:, 0], seg[:, 1], lw=1.2)
    ax.set_aspect("equal")
    ax.set_title(f"{mesh.num_cells} cells / {mesh.num_faces} faces")
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_cell_field(mesh, values, path: str | None = None, *, cmap="viridis", title=""):
    """Flat-shaded cell-field plot (the Vulture cell rendering analog)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if mesh.dim != 2:
        raise NotImplementedError("plot_cell_field renders 2-D meshes")
    pos = np.asarray(mesh.node_positions)
    values = np.asarray(values).reshape(mesh.num_cells, -1)[:, 0]
    tris, tri_ids = _tri_split(mesh, with_cell_ids=True)
    tri_vals = values[tri_ids]
    fig, ax = plt.subplots(figsize=(7, 7))
    tpc = ax.tripcolor(pos[:, 0], pos[:, 1], tris, facecolors=tri_vals, cmap=cmap)
    fig.colorbar(tpc, ax=ax, shrink=0.8)
    ax.set_aspect("equal")
    if title:
        ax.set_title(title)
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_convergence(histories: dict, path: str | None = None):
    """Residual-history comparison plot for solver results.

    ``histories``: name → 1-D array of per-iteration absolute errors
    (``SolveResult.history``; NaN/zero padding is trimmed).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for name, h in histories.items():
        h = np.asarray(h)
        h = h[np.isfinite(h) & (h > 0)]
        ax.semilogy(h, label=name)
    ax.set_xlabel("iteration")
    ax.set_ylabel("absolute residual")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig
