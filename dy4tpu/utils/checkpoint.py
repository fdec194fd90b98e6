"""Checkpoint / resume of the streaming receiver.

The reference has no cross-run persistence; its entire in-run state is the
per-block carried table (SURVEY.md §2.4).  Here that state is already a
pytree (``ReceiverState``) plus the small host-side decoder objects, so a
checkpoint is a single compressed npz: every array leaf keyed by its tree
path, host decoder state pickled alongside.  Saving mid-stream and resuming
reproduces the exact continuation (verified in tests/test_checkpoint.py).

.. warning::
   Checkpoints are **trusted input only**.  The treedef and host-decoder
   payloads are pickled (host state holds live decoder objects), so
   ``load()`` on a file from an untrusted source is arbitrary code
   execution — the same trust model as a pickle/torch checkpoint.  Never
   pass user-supplied files to ``--resume``.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Optional

import numpy as np
import jax


def _flatten(tree: Any) -> tuple[list[np.ndarray], Any]:
    leaves, treedef = jax.tree.flatten(tree)
    return [np.asarray(x) for x in leaves], treedef


def save(path: str, state: Any, *, host_state: Optional[dict] = None,
         meta: Optional[dict] = None) -> None:
    """Write ``state`` (any pytree of arrays) and optional host-side
    objects to ``path`` (.npz)."""
    leaves, treedef = _flatten(state)
    payload = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(
        pickle.dumps(treedef), np.uint8)
    payload["host"] = np.frombuffer(
        pickle.dumps(host_state or {}), np.uint8)
    payload["meta"] = np.frombuffer(pickle.dumps(meta or {}), np.uint8)
    buf = io.BytesIO()
    np.savez_compressed(buf, **payload)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load(path: str) -> tuple[Any, dict, dict]:
    """Returns ``(state, host_state, meta)``.

    Unpickles the treedef/host/meta payloads: only load files this
    process (or a trusted peer) wrote — see the module warning.
    """
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["treedef"].tobytes())
        host = pickle.loads(z["host"].tobytes())
        meta = pickle.loads(z["meta"].tobytes())
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    return jax.tree.unflatten(treedef, leaves), host, meta
