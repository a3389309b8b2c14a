"""Checkpoint / resume.

The reference has none (SURVEY.md §5: state is regenerated on scene load and
the `restart` input action has no handler). For long benchmark runs and
replay tests we add simple array-state checkpoints: the full state pytree +
params to a single .npz (portable, no extra deps). Orbax is available in the
image for users who want async/sharded checkpointing of the same pytrees.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams, SimConfig
from ..core.state import SimState


def save(path: str, state, fluid: FluidParams, config: SimConfig, extra: dict | None = None):
    """Save any registered-dataclass state pytree (SimState or BucketState)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"state_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays.update(
        {f"fluid_{k}": np.asarray(v) for k, v in dataclasses.asdict(fluid).items()}
    )
    meta = {
        "state_class": type(state).__name__,
        "config": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in dataclasses.asdict(config).items()
            if k != "dtype"
        },
        "extra": extra or {},
    }
    np.savez_compressed(path, __meta__=np.frombuffer(json.dumps(meta).encode(), np.uint8), **arrays)


def load(path: str):
    """Returns (state, fluid, config_dict, extra). State class is recovered
    by name (SimState or BucketState)."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    n = len([k for k in data.files if k.startswith("state_")])
    leaves = [jnp.asarray(data[f"state_{i}"]) for i in range(n)]
    if meta["state_class"] == "SimState":
        template = SimState(*([None] * 5))
    else:
        import dataclasses as _dc

        from ..ops.bucketed import BucketState

        n_fields = len(_dc.fields(BucketState))
        # older checkpoints predate the cfl_clamped counter — pad with zeros
        while len(leaves) < n_fields:
            leaves.append(jnp.asarray(0, jnp.int32))
        template = BucketState(*([None] * n_fields))
    treedef = jax.tree_util.tree_structure(
        template, is_leaf=lambda x: x is None
    )
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    fluid_kw = {
        k[len("fluid_") :]: jnp.asarray(data[k])
        for k in data.files
        if k.startswith("fluid_")
    }
    fluid = FluidParams(**fluid_kw)
    return state, fluid, meta["config"], meta["extra"]
