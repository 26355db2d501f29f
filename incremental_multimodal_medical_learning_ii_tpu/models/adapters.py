"""Trainable adapter heads on top of the frozen 128-d joint latent space.

Reference: ``models.py:7-26`` (``myMLP``: Linear(128,256)+ReLU+Linear(256,128);
``myLinearModel``: Linear(128,128)) and the shared/double/only-X wiring in
``Trainer.__init__`` (``Trainer.py:125-168``).

TPU notes: the adapters are tiny (<100k params) and always replicated; their
forward is one or two MXU matmuls over a (batch, 128) activation.  Parameters
are initialised with the same scheme torch's ``nn.Linear`` uses
(Kaiming-uniform weights, fan-in uniform bias) so that training dynamics
match the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    AdapterKind,
    JOINT_FEATURE_SIZE,
)

Params = Dict[str, Any]


def _torch_linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """torch ``nn.Linear`` default init: U(-1/sqrt(in), 1/sqrt(in)) for both
    the weight and the bias (kernel stored (in, out), XLA-friendly layout)."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    kernel = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)
    bias = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


def init_mlp_adapter(key: jax.Array, dim: int = JOINT_FEATURE_SIZE, hidden: int = 256) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "dense1": _torch_linear_init(k1, dim, hidden),
        "dense2": _torch_linear_init(k2, hidden, dim),
    }


def init_linear_adapter(key: jax.Array, dim: int = JOINT_FEATURE_SIZE) -> Params:
    return {"dense1": _torch_linear_init(key, dim, dim)}


# fp32 MXU passes: the adapter matmuls are tiny and the default TPU bf16
# matmul would drift from the torch-reference training dynamics.
_HIGHEST = jax.lax.Precision.HIGHEST


def mlp_adapter_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = jnp.matmul(x, params["dense1"]["kernel"], precision=_HIGHEST) + params["dense1"]["bias"]
    h = jax.nn.relu(h)
    return jnp.matmul(h, params["dense2"]["kernel"], precision=_HIGHEST) + params["dense2"]["bias"]


def linear_adapter_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, params["dense1"]["kernel"], precision=_HIGHEST) + params["dense1"]["bias"]


@dataclasses.dataclass(frozen=True)
class MLPAdapter:
    hidden: int = 256
    dim: int = JOINT_FEATURE_SIZE

    def init(self, key: jax.Array) -> Params:
        return init_mlp_adapter(key, self.dim, self.hidden)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return mlp_adapter_apply(params, x)


@dataclasses.dataclass(frozen=True)
class LinearAdapter:
    dim: int = JOINT_FEATURE_SIZE

    def init(self, key: jax.Array) -> Params:
        return init_linear_adapter(key, self.dim)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return linear_adapter_apply(params, x)


def make_adapter(kind: AdapterKind):
    if kind == AdapterKind.MLP:
        return MLPAdapter()
    if kind == AdapterKind.DENSE:
        return LinearAdapter()
    return None  # no-head


@dataclasses.dataclass
class AdapterPair:
    """Image/text adapter wiring (shared / double / only-one / none).

    ``params`` holds a single pytree; when ``shared`` both towers apply the
    same subtree, reproducing ``Trainer.py:134-140`` where one module object
    is registered as both adapters and receives gradients from both paths.
    """

    kind: AdapterKind
    shared: bool
    use_image: bool
    use_text: bool

    def __post_init__(self) -> None:
        self._module = make_adapter(self.kind)
        if self.kind == AdapterKind.NO_HEAD:
            self.use_image = False
            self.use_text = False

    def init(self, key: jax.Array) -> Params:
        params: Params = {}
        if self._module is None:
            return params
        if self.shared:
            params["shared"] = self._module.init(key)
            return params
        k_img, k_txt = jax.random.split(key)
        if self.use_image:
            params["image"] = self._module.init(k_img)
        if self.use_text:
            params["text"] = self._module.init(k_txt)
        return params

    def apply_image(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        if not self.use_image:
            return x
        sub = params["shared"] if self.shared else params["image"]
        return self._module.apply(sub, x)

    def apply_text(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        if not self.use_text:
            return x
        sub = params["shared"] if self.shared else params["text"]
        return self._module.apply(sub, x)


def init_adapters(
    key: jax.Array,
    kind: AdapterKind,
    shared: bool,
    use_image: bool,
    use_text: bool,
) -> tuple[AdapterPair, Params]:
    pair = AdapterPair(kind=kind, shared=shared, use_image=use_image, use_text=use_text)
    return pair, pair.init(key)
