"""Checkpoint/resume for long-running SLAM loops.

The reference has no serialization of any kind — filter state lives in locals
of ``main`` (SURVEY.md section 5, test/main.cpp:106-108).  Long valet-loop and
distributed configs (BASELINE.json configs 4-5) need restartable state: the
full carry (sim truth, steering, filter state or ensemble, RNG key) checkpoints
as one pytree via orbax.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, state: Any) -> None:
    """Save a pytree checkpoint (overwrites)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, jax.device_get(state), force=True)


def restore(path: str, template: Any) -> Any:
    """Restore a pytree checkpoint onto the structure/dtypes of ``template``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = _checkpointer()
    restored = ckpt.restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(
        lambda t, r: jax.numpy.asarray(r, dtype=t.dtype)
        if hasattr(t, "dtype")
        else r,
        template,
        restored,
    )
