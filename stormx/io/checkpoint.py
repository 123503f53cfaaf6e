"""Checkpoint / resume for fields and solver state.

The reference has none — its only persistence is write-only VTK snapshots
(``Playground.cpp:66-109,207-208``; SURVEY §5 "Checkpoint / resume:
None").  The rebuild adds restartable simulations: any pytree of arrays
(cell fields, Krylov solver state, time-step counters) round-trips through
a directory checkpoint, keyed by step and stamped with the partition
layout so a resume onto a different device count is detected rather than
silently mis-sharded.

Two backends:

* ``orbax`` (preferred; in the image) — async-capable, sharding-aware.
* ``npz`` fallback — plain NumPy archive, zero dependencies.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_step", "Checkpointer"]

_META = "stormx_meta.json"


def _layout_signature(num_parts: int | None) -> dict:
    return {
        "num_parts": num_parts,
        "num_devices": jax.device_count() if num_parts is None else num_parts,
    }


def save_checkpoint(
    directory: str,
    step: int,
    state,
    *,
    num_parts: int | None = None,
    backend: str = "npz",
) -> str:
    """Write pytree ``state`` under ``directory/step_<step>``; returns path."""
    path = os.path.join(directory, f"step_{step:010d}")
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    meta = {
        "step": step,
        "treedef": str(treedef),
        "num_leaves": len(leaves),
        "layout": _layout_signature(num_parts),
        "backend": backend,
    }
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            os.path.join(os.path.abspath(path), "tree"),
            [np.asarray(l) for l in leaves],
        )
    elif backend == "npz":
        np.savez(
            os.path.join(path, "tree.npz"),
            **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(
    directory: str,
    step: int | None = None,
    *,
    like=None,
    num_parts: int | None = None,
):
    """Load the checkpoint at ``step`` (default latest).

    ``like``: a pytree with the target structure; the stored leaves are
    unflattened into it.  Without it, the flat leaf list is returned.
    Raises if the stored partition layout differs from ``num_parts``
    (pass the current layout to get the mismatch check).
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(directory, f"step_{step:010d}")
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if num_parts is not None and meta["layout"]["num_parts"] not in (None, num_parts):
        raise ValueError(
            f"checkpoint was written with num_parts={meta['layout']['num_parts']}, "
            f"resume requested num_parts={num_parts}; repartition explicitly"
        )
    if meta["backend"] == "orbax":
        import orbax.checkpoint as ocp

        leaves = ocp.PyTreeCheckpointer().restore(
            os.path.join(os.path.abspath(path), "tree")
        )
    else:
        with np.load(os.path.join(path, "tree.npz")) as z:
            leaves = [z[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves), meta["step"]
    return leaves, meta["step"]


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(directory)
        if (m := re.fullmatch(r"step_(\d+)", name))
    ]
    return max(steps) if steps else None


class Checkpointer:
    """Periodic checkpointing helper for time loops.

    >>> ck = Checkpointer("ckpts", every=100)
    >>> for step in range(start, end):
    ...     state = advance(state)
    ...     ck.maybe_save(step, state)
    """

    def __init__(
        self,
        directory: str,
        *,
        every: int = 100,
        keep: int = 3,
        num_parts: int | None = None,
        backend: str = "npz",
    ):
        self.directory = directory
        self.every = every
        self.keep = keep
        self.num_parts = num_parts
        self.backend = backend

    def maybe_save(self, step: int, state) -> str | None:
        if step % self.every:
            return None
        path = save_checkpoint(
            self.directory,
            step,
            state,
            num_parts=self.num_parts,
            backend=self.backend,
        )
        self._prune()
        return path

    def restore(self, like=None):
        return load_checkpoint(
            self.directory, like=like, num_parts=self.num_parts
        )

    def _prune(self) -> None:
        import shutil

        steps = sorted(
            int(m.group(1))
            for name in os.listdir(self.directory)
            if (m := re.fullmatch(r"step_(\d+)", name))
        )
        for s in steps[: -self.keep]:
            shutil.rmtree(
                os.path.join(self.directory, f"step_{s:010d}"), ignore_errors=True
            )
