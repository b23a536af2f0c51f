"""Checkpoint / resume for streaming graphs.

The reference has none (SURVEY §5: closest is Repeat + SigMF offsets); here
the streaming runner's whole condition is (stream offset, per-block state
pytree), so a checkpoint is those pytrees with device arrays pulled to host
plus the global sample offset.  Restore rebuilds the exact stream suffix.

Format: a pickle of numpy-ified pytrees.  Some blocks type their state
lazily (None until the first chunk fixes the stream dtype), so the state
*structure* itself must round-trip, not just leaf values.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def _to_host(tree):
    # Pull DEVICE arrays to host; leave host-side leaves (numpy, scalars,
    # and especially Tag objects riding e.g. StreamToPdu's state['tags'])
    # untouched — np.asarray would wrap a Tag into a 0-d object ndarray
    # and break attribute access after resume.
    def pull(x):
        return np.asarray(x) if isinstance(x, jax.Array) else x

    return jax.tree_util.tree_map(pull, tree)


def save_checkpoint(path: str, states: dict, offset: int, extra: dict | None = None):
    """Save per-block state pytrees + stream offset."""
    payload = {
        "states": {k: _to_host(v) for k, v in states.items()},
        "offset": int(offset),
        "extra": extra or {},
        "version": 1,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, template_states: dict | None = None):
    """Restore (states, offset, extra).

    ``template_states`` (from ``block.init_state()``) is used only to
    validate that the graph shape matches the checkpoint.
    """
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != 1:
        raise ValueError(f"unknown checkpoint version in {path}")
    states = payload["states"]
    if template_states is not None:
        missing = set(template_states) - set(states)
        if missing:
            raise ValueError(
                f"checkpoint {path} lacks state for blocks {sorted(missing)}; "
                "graph structure changed?"
            )
    return states, payload["offset"], payload["extra"]
