"""Checkpointing: msgpack train-state snapshots + JSON config.

Counterpart of the reference's `util.custom_save/custom_load`
(util.py:17-46), which writes a dict of named module state_dicts.  Here the
whole TrainState pytree (params / constants / spectral / opt_state / step)
serializes via flax msgpack; the params tree already carries the
reference's part structure as submodule keys (texture_mapper, render_net,
gcn, lighting).  A JSON config snapshot sits next to it, mirroring
`params.txt` as the inference-time config source (test_rnr.py:53-79).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import flax.serialization

from rnr_tpu.train.steps import TrainState


def save_checkpoint(path: str, state: TrainState) -> None:
    state = jax.device_get(state)
    payload = flax.serialization.to_bytes(state._asdict())
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (from create_*_state)."""
    with open(path, "rb") as f:
        payload = f.read()
    restored = flax.serialization.from_bytes(template._asdict(), payload)
    return TrainState(**restored)


def load_checkpoint_parts(
    path: str, template: TrainState, parts: list[str]
) -> TrainState:
    """Restore only the named param parts (reference custom_load semantics:
    selected modules, util.py:17-30)."""
    full = load_checkpoint(path, template)
    new_params = dict(template.params)
    for p in parts:
        new_params[p] = full.params[p]
    return template._replace(params=new_params, constants=full.constants,
                             spectral=full.spectral)
