"""Model checkpointing via Orbax.

The reference's checkpoint path is dead code (EarlyStopping.save_checkpoint
exists but its call sites are commented out, reference utils.py:236-266).
This module makes it real: params + optimizer state + training metadata are
saved/restored with Orbax, the standard JAX checkpointing library.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> str:
    """Save a training checkpoint; returns the checkpoint path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if metadata:
        state["metadata"] = {
            k: np.asarray(v) for k, v in metadata.items()
        }
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: Any = None) -> Dict[str, Any]:
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    Args:
      path: checkpoint directory.
      template: optional pytree with the same structure/shapes (enables
        exact dtype/sharding restoration).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)
