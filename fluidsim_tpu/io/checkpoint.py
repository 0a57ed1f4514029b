"""Exact checkpoint/resume.

The reference has no checkpointing: its per-frame ``.vdb`` dumps hold only the
output grid, so particle state is lost and true resume is impossible
(SURVEY.md §5).  Here a checkpoint is the full simulation pytree (particles,
deformation gradients, dt, frame index) plus enough config to validate
compatibility — resume is bit-exact.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax


def save_checkpoint(path: str, state, params=None, extra: dict | None = None):
    """Serialize a (registered-dataclass) state pytree to ``.npz``."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {
        "state_class": type(state).__name__,
        "fields": [f.name for f in dataclasses.fields(state)],
        "params": dataclasses.asdict(params) if params is not None else None,
        "extra": extra or {},
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(path: str, state_cls, dtype=None):
    """Rebuild the state pytree.  Returns (state, meta)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if meta["state_class"] != state_cls.__name__:
            raise ValueError(
                f"checkpoint holds {meta['state_class']}, expected {state_cls.__name__}")
        fields = meta["fields"]
        leaves = [z[f"leaf_{i}"] for i in range(len(fields))]
    kwargs = {name: (leaf if dtype is None or leaf.dtype.kind in "iu"
                     else leaf.astype(dtype))
              for name, leaf in zip(fields, leaves)}
    import jax.numpy as jnp
    return state_cls(**{k: jnp.asarray(v) for k, v in kwargs.items()}), meta
