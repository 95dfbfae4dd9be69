"""Checkpoint / resume for solver state.

The reference has none (SURVEY.md §5): its nearest analogs are warm-start
kwargs and `reset!`.  Here the whole solver state is one pytree, so
checkpointing is serialization + resume is feeding the state back into the
stepper — `solver.solve(resume_from=state)` continues exactly where the
saved run stopped (tolerances are carried inside the state, so the stopping
criteria are preserved).

Covers BOTH state families: the dense :class:`SolverState` and the
matrix-free :class:`MFState` carried by the long-running engines
(``MatrixFreeSolver`` / ``SchurBASolver``) — the runs that actually need
checkpoint/resume.  The state kind is recorded in the file and dispatched on
load.

Format: a single ``.npz`` with flattened leaves + a structure descriptor.
Works for batched (vsolve) states too — every leaf just carries its batch
axis.

Version note: round 4 renamed the dense state's Jacobian field ``Jx``
(m, n) to ``JxT`` (n, m, the natural linearize layout); ``load_state``
migrates old checkpoints transparently (transposes the stored leaf).
"""

from __future__ import annotations

import json
import pathlib

import jax
import numpy as np

from ..core.matfree import MFState
from ..core.solver import SolverState

__all__ = ["save_state", "load_state"]

_KINDS = {"SolverState": SolverState, "MFState": MFState}


def save_state(path, state) -> None:
    """Serialize a SolverState or MFState (possibly batched) to ``path``
    (.npz)."""
    path = pathlib.Path(path)
    kind = type(state).__name__
    if kind not in _KINDS:
        raise TypeError(
            f"save_state handles SolverState and MFState, got {kind}"
        )
    leaves = {}
    meta = {"kind": kind, "fields": [], "has_data": state.data is not None}
    for name in type(state)._fields:
        val = getattr(state, name)
        if name == "data":
            if val is None:
                continue
            data_leaves, treedef = jax.tree.flatten(val)
            meta["data_treedef"] = str(treedef)
            meta["n_data_leaves"] = len(data_leaves)
            for i, leaf in enumerate(data_leaves):
                leaves[f"data__{i}"] = np.asarray(leaf)
            continue
        leaves[name] = np.asarray(val)
        meta["fields"].append(name)
    np.savez(path, __meta__=json.dumps(meta), **leaves)


def load_state(path, data_template=None):
    """Load a saved state (SolverState or MFState, dispatched on the file's
    kind tag).  If the checkpoint carried problem data, pass a
    ``data_template`` pytree with the same structure to rebuild it."""
    path = pathlib.Path(path)
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        cls = _KINDS[meta.get("kind", "SolverState")]
        kw = {name: jax.numpy.asarray(z[name]) for name in meta["fields"]}
        if "Jx" in kw and cls is SolverState:
            # pre-round-4 checkpoint: the dense Jacobian was stored as Jx
            # (..., m, n); migrate to the natural linearize layout JxT
            # (..., n, m) instead of failing with an opaque TypeError
            kw["JxT"] = jax.numpy.swapaxes(kw.pop("Jx"), -2, -1)
        if meta.get("has_data"):
            n = meta["n_data_leaves"]
            data_leaves = [jax.numpy.asarray(z[f"data__{i}"]) for i in range(n)]
            if data_template is not None:
                treedef = jax.tree.structure(data_template)
                kw["data"] = jax.tree.unflatten(treedef, data_leaves)
            elif n == 1:
                kw["data"] = data_leaves[0]
            else:
                kw["data"] = tuple(data_leaves)
        else:
            kw["data"] = None
    return cls(**kw)
