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

    if mesh.dim == 3:
        return _visualize_mesh_3d(mesh, path, show_edges=show_edges)
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


def _boundary_face_polys(mesh):
    """Boundary faces as vertex-coordinate polygons + their labels and
    inner-cell ids (−1 padding stripped per face)."""
    pos = np.asarray(mesh.node_positions)
    bidx = mesh.boundary_faces()
    fn = np.asarray(mesh.face_nodes)[bidx]
    polys = [pos[row[row >= 0]] for row in fn]
    labels = np.asarray(mesh.face_labels)[bidx]
    inner = np.asarray(mesh.face_cells)[bidx, 0]
    return polys, labels, inner


def _visualize_mesh_3d(mesh, path=None, *, show_edges=True):
    """3-D mesh render: boundary surface colored by label, matplotlib 3-D
    axes (rotatable when shown interactively) — the Vulture
    ``visualize_mesh`` replacement for TopoDim 3
    (``Vulture/Visualizer.hpp:52-365``; SURVEY §2.7 sanctions the
    matplotlib/VTK substitution)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    polys, labels, _ = _boundary_face_polys(mesh)
    fig = plt.figure(figsize=(8, 7))
    ax = fig.add_subplot(projection="3d")
    cmap = plt.get_cmap("tab10")
    for lab in np.unique(labels):
        sel = [p for p, l in zip(polys, labels) if l == lab]
        coll = Poly3DCollection(
            sel,
            facecolor=cmap(int(lab) % 10),
            edgecolor="0.3" if show_edges else None,
            linewidths=0.2,
            alpha=0.95,
        )
        ax.add_collection3d(coll)
    pos = np.asarray(mesh.node_positions)
    ax.set_xlim(pos[:, 0].min(), pos[:, 0].max())
    ax.set_ylim(pos[:, 1].min(), pos[:, 1].max())
    ax.set_zlim(pos[:, 2].min(), pos[:, 2].max())
    ax.set_box_aspect(pos.max(axis=0) - pos.min(axis=0))
    ax.set_title(f"{mesh.num_cells} cells / {mesh.num_faces} faces")
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_cell_field(mesh, values, path: str | None = None, *, cmap="viridis", title=""):
    """Flat-shaded cell-field plot (the Vulture cell rendering analog).
    3-D meshes render the field of each boundary face's inner cell on the
    boundary surface."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if mesh.dim == 3:
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        values = np.asarray(values).reshape(mesh.num_cells, -1)[:, 0]
        polys, _, inner = _boundary_face_polys(mesh)
        vals = values[inner]
        fig = plt.figure(figsize=(8, 7))
        ax = fig.add_subplot(projection="3d")
        cm = plt.get_cmap(cmap)
        lo, hi = float(vals.min()), float(vals.max())
        span = (hi - lo) or 1.0
        coll = Poly3DCollection(
            polys, facecolors=cm((vals - lo) / span), edgecolor=None
        )
        ax.add_collection3d(coll)
        pos = np.asarray(mesh.node_positions)
        ax.set_xlim(pos[:, 0].min(), pos[:, 0].max())
        ax.set_ylim(pos[:, 1].min(), pos[:, 1].max())
        ax.set_zlim(pos[:, 2].min(), pos[:, 2].max())
        ax.set_box_aspect(pos.max(axis=0) - pos.min(axis=0))
        sm = plt.cm.ScalarMappable(
            cmap=cm, norm=matplotlib.colors.Normalize(lo, hi)
        )
        fig.colorbar(sm, ax=ax, shrink=0.7)
        if title:
            ax.set_title(title)
        if path:
            fig.savefig(path, dpi=150, bbox_inches="tight")
            plt.close(fig)
        return fig
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
