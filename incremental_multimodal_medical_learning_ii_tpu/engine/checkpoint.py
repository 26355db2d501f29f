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


def save_checkpoint(directory: str | Path, state: TrainState) -> Path:
    import orbax.checkpoint as ocp

    path = Path(directory).absolute() / "train_state"
    if path.exists():
        import shutil

        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    return path


def restore_checkpoint(directory: str | Path, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = Path(directory).absolute() / "train_state"
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, jax.device_get(template))
    return jax.tree_util.tree_map(np.asarray, restored)


# ----------------------------------------------------------------------
# Part/task-level resume for the incremental protocols
# ----------------------------------------------------------------------
def save_progress(directory: str | Path, completed: int, aux: dict | None = None) -> None:
    """Record completed part/task count plus the trainer's host-side stream
    state (``aux``: shuffle-rng state, iteration counters, heatmap rows) so
    a resumed run is bit-reproducible, not just weight-correct."""
    import json

    Path(directory).mkdir(parents=True, exist_ok=True)
    payload: dict = {"completed": completed}
    if aux is not None:
        payload["aux"] = aux
    (Path(directory) / "progress.json").write_text(json.dumps(payload))


def load_progress(directory: str | Path) -> int:
    """Number of completed parts/tasks recorded in ``directory`` (0 if none)."""
    import json

    path = Path(directory) / "progress.json"
    if not path.exists():
        return 0
    return int(json.loads(path.read_text())["completed"])


def load_aux(directory: str | Path) -> dict | None:
    """The trainer aux state saved alongside progress (None if absent)."""
    import json

    path = Path(directory) / "progress.json"
    if not path.exists():
        return None
    return json.loads(path.read_text()).get("aux")
