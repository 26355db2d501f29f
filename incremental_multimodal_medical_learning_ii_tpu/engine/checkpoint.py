"""Checkpointing with orbax.

The reference only ever saves whole adapter modules with ``torch.save``
(``Trainer.py:1643-1648``) and its ``load`` is broken (calls ``torch.save``,
``Trainer.py:1655``); no optimizer state or resume exists.  Here checkpoints
carry the full :class:`TrainState` (adapter params + optax state + step) and
restore is implemented and tested.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.engine.steps import TrainState


def save_checkpoint(directory: str | Path, state: TrainState, name: str = "train_state") -> Path:
    import orbax.checkpoint as ocp

    path = Path(directory).absolute() / name
    if path.exists():
        import shutil

        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    return path


def restore_checkpoint(directory: str | Path, template: TrainState, name: str = "train_state") -> TrainState:
    import orbax.checkpoint as ocp

    path = Path(directory).absolute() / name
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, jax.device_get(template))
    return jax.tree_util.tree_map(np.asarray, restored)


# ----------------------------------------------------------------------
# Part/task-level resume for the incremental protocols
# ----------------------------------------------------------------------
def save_progress(directory: str | Path, completed: int, aux: dict | None = None) -> None:
    """Record completed part/task count plus the trainer's host-side stream
    state (``aux``: shuffle-rng state, iteration counters, heatmap rows) so
    a resumed run is bit-reproducible, not just weight-correct.  Written
    atomically (tmp + rename): a crash mid-write must never leave a
    truncated progress file that would abort the very resume it enables."""
    import json
    import os

    Path(directory).mkdir(parents=True, exist_ok=True)
    payload: dict = {"completed": completed}
    if aux is not None:
        payload["aux"] = aux
    path = Path(directory) / "progress.json"
    tmp = path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(payload))
    os.replace(tmp, path)


def _read_progress(directory: str | Path) -> dict:
    import json

    path = Path(directory) / "progress.json"
    if not path.exists():
        return {}
    try:
        return json.loads(path.read_text())
    except (ValueError, OSError) as e:  # corrupt file: restart rather than abort
        print(f"[resume] unreadable progress.json ({e}); starting from scratch")
        return {}


def load_progress(directory: str | Path) -> int:
    """Number of completed parts/tasks recorded in ``directory`` (0 if none
    or unreadable)."""
    return int(_read_progress(directory).get("completed", 0))


def load_aux(directory: str | Path) -> dict | None:
    """The trainer aux state saved alongside progress (None if absent)."""
    return _read_progress(directory).get("aux")
