"""Checkpoint / resume (orbax-backed).

The reference has no checkpointing at all - a crashed run is lost
(SURVEY.md S5.3-4: `train` returns nothing and parameters live only in
in-memory modules). Here training state is an explicit pytree, so
save/restore is one call each:

    state = TrainState(components, opt_state, key, step)
    checkpoint.save(path, state)
    state = checkpoint.restore(path, state)   # template for structure

Component pytrees restore with their original dataclass structure because
restore takes a matching template (the usual orbax pattern).
"""

from __future__ import annotations

import pathlib
from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    components: Any    # (initial, transition, emission, proposal)
    opt_state: Any
    key: Any
    step: int = struct.field(pytree_node=False, default=0)


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path, state: TrainState, force: bool = True) -> None:
    """Writes the training state pytree to `path` (a directory)."""
    path = pathlib.Path(path).absolute()
    _checkpointer().save(path, {"tree": state, "step": state.step},
                         force=force)


def restore(path, template: TrainState) -> TrainState:
    """Reads a training state saved by `save`. `template` provides the
    pytree structure/dtypes (pass a freshly-initialized TrainState)."""
    path = pathlib.Path(path).absolute()
    restored = _checkpointer().restore(
        path, item={"tree": template, "step": template.step})
    state = restored["tree"]
    return state.replace(step=restored["step"])
