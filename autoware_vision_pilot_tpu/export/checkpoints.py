"""Checkpointing: orbax for training state (model+optimizer+step resume —
the capability the reference's Lite trainer has via `_maybe_resume`,
Models/training/lite_trainer_base.py:283) and flax msgpack for portable
weight files (analog of the reference's .pt state_dict blobs).
"""
from __future__ import annotations

import pathlib
from typing import Any, Optional

import orbax.checkpoint as ocp
from flax import serialization


def save_checkpoint(path: str | pathlib.Path, state: Any,
                    step: Optional[int] = None, keep: int = 3):
    """Save a pytree (e.g. TrainState) under path/step_N with orbax."""
    path = pathlib.Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(
            str(path),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep)) as mgr:
        s = int(step if step is not None else getattr(state, "step", 0))
        mgr.save(s, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return path


def load_checkpoint(path: str | pathlib.Path, target: Any,
                    step: Optional[int] = None) -> Any:
    """Restore the latest (or given) step into the structure of `target`."""
    path = pathlib.Path(path).resolve()
    with ocp.CheckpointManager(str(path)) as mgr:
        s = step if step is not None else mgr.latest_step()
        if s is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        return mgr.restore(s, args=ocp.args.StandardRestore(target))


def save_msgpack(path: str | pathlib.Path, variables: Any):
    """Portable single-file weights (flax msgpack)."""
    data = serialization.to_bytes(variables)
    pathlib.Path(path).write_bytes(data)


def load_msgpack(path: str | pathlib.Path, target: Any) -> Any:
    return serialization.from_bytes(target,
                                    pathlib.Path(path).read_bytes())
