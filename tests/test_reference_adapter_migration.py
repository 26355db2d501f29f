"""Migration of the reference's pickled whole-module adapter checkpoints
(``torch.save(self.image_adapter, ...)``, Trainer.py:1643-1648)."""

import sys
import types

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.models.adapters import (
    linear_adapter_apply,
    mlp_adapter_apply,
)
from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
    load_reference_adapter,
)


def _reference_style_module(kind: str):
    """Build a module whose pickled class path is models.myMLP, exactly as
    the reference's torch.save(module) records it."""
    stub = types.ModuleType("models")

    class myMLP(nn.Module):  # noqa: N801
        def __init__(self):
            super().__init__()
            self.layer = nn.Sequential(nn.Linear(128, 256), nn.ReLU(), nn.Linear(256, 128))

    class myLinearModel(nn.Module):  # noqa: N801
        def __init__(self):
            super().__init__()
            self.layer = nn.Sequential(nn.Linear(128, 128))

    myMLP.__module__ = "models"
    myMLP.__qualname__ = "myMLP"
    myLinearModel.__module__ = "models"
    myLinearModel.__qualname__ = "myLinearModel"
    stub.myMLP = myMLP
    stub.myLinearModel = myLinearModel
    sys.modules["models"] = stub
    return myMLP() if kind == "mlp" else myLinearModel()


def test_mlp_adapter_migration(tmp_path, rng):
    torch.manual_seed(1)
    m = _reference_style_module("mlp")
    path = tmp_path / "image_adapter.pt"
    torch.save(m, path)
    sys.modules.pop("models", None)

    params = load_reference_adapter(str(path))
    x = rng.normal(size=(4, 128)).astype(np.float32)
    ours = np.asarray(mlp_adapter_apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = m.layer(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_linear_adapter_migration(tmp_path, rng):
    torch.manual_seed(2)
    m = _reference_style_module("dense")
    path = tmp_path / "text_adapter.pt"
    torch.save(m, path)
    sys.modules.pop("models", None)

    params = load_reference_adapter(str(path))
    assert set(params) == {"dense1"}
    x = rng.normal(size=(4, 128)).astype(np.float32)
    ours = np.asarray(linear_adapter_apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = m.layer(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
