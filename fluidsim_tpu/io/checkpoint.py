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
    """Serialize a (registered-dataclass) state pytree to ``.npz``.

    Fields are stored by name; optional (None) fields — e.g. the APIC
    ``aff`` matrices when running plain FLIP — are recorded as absent.
    """
    arrays = {}
    none_fields = []
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is None:
            none_fields.append(f.name)
        else:
            arrays[f"field_{f.name}"] = np.asarray(v)
    meta = {
        "state_class": type(state).__name__,
        "fields": [f.name for f in dataclasses.fields(state)],
        "none_fields": none_fields,
        "params": dataclasses.asdict(params) if params is not None else None,
        "extra": extra or {},
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(path: str, state_cls, dtype=None):
    """Rebuild the state pytree.  Returns (state, meta)."""
    import jax.numpy as jnp
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if meta["state_class"] != state_cls.__name__:
            raise ValueError(
                f"checkpoint holds {meta['state_class']}, expected {state_cls.__name__}")
        kwargs = {}
        for name in meta["fields"]:
            if name in meta.get("none_fields", []):
                kwargs[name] = None
                continue
            leaf = z[f"field_{name}"]
            if dtype is not None and leaf.dtype.kind == "f":
                leaf = leaf.astype(dtype)
            kwargs[name] = jnp.asarray(leaf)
    return state_cls(**kwargs), meta
