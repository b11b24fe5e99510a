"""Checkpoint save/restore via Orbax.

TPU-native replacement for the reference's basicsr checkpointing
(5 x ``.pth`` + training state every 1000 iters, resume via
``path.resume_state`` — ``tspgan_model.py:623-629``,
``train.yml:74,183-184``): the whole ``TrainState`` pytree (all five nets,
optimizer states, spectral-norm vectors, step counter) is one Orbax
checkpoint; old checkpoints are garbage-collected by ``max_to_keep``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(ckpt_dir: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_state(ckpt_dir: str, step: int, state: Any,
               max_to_keep: int = 5) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    return mgr.latest_step()


def restore_state(ckpt_dir: str, target: Any,
                  step: Optional[int] = None) -> Any:
    """Restore into the structure of ``target`` (an abstract or concrete
    ``TrainState``)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, target)
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
