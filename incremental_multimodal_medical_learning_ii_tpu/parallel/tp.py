"""Tensor-parallel (Megatron-style) sharding for the CXR-BERT text tower.

The reference runs its BERT tower on a single ``cuda``-or-``cpu`` device
(``health_multimodal/text/inference_engine.py``); this module is the
TPU-native scale-out path for the text encoder on a 2-D ``(data, model)``
mesh: batches shard over the ``data`` axis, attention heads and FFN hidden
units over the ``model`` axis.

The design is pure GSPMD: sharding is expressed only as ``NamedSharding``
placements on the parameter pytree (column-parallel q/k/v and ``ffn_in``,
row-parallel ``attn_out`` and ``ffn_out``), and XLA's SPMD partitioner
propagates them through the UNCHANGED functional forward
(``models/cxr_bert.py::bert_encode``), inserting exactly two all-reduces
per layer (after the attention output projection and after ``ffn_out``)
that ride the ICI.  No model code is rewritten for parallelism — that is
the point of sharding-annotated SPMD over a device mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    BertDims,
    get_projected_text_embeddings,
)
from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

Params = dict


def create_mesh_2d(
    data: int,
    model: int,
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
) -> Mesh:
    """(data x model) mesh; the model axis is the fast-varying one so TP
    collectives ride neighbouring ICI links."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < data * model:
        raise ValueError(f"need {data * model} devices, have {len(devices)}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (data_axis, model_axis))


def _ln(_: str = MODEL_AXIS):
    return {"scale": P(), "bias": P()}


def bert_tp_specs(params: Params, model_axis: str = MODEL_AXIS) -> Params:
    """PartitionSpec pytree mirroring ``init_cxr_bert``'s structure.

    Column-parallel: q/k/v and ffn_in kernels shard their OUTPUT dim (heads
    / intermediate units), biases follow.  Row-parallel: attn_out and
    ffn_out kernels shard their INPUT dim; their biases are replicated (the
    partial sums all-reduce before the bias add).  Embeddings, LayerNorms
    and the heads are replicated — they are small and read-only here.
    """
    col = {"kernel": P(None, model_axis), "bias": P(model_axis)}
    row = {"kernel": P(model_axis, None), "bias": P()}
    rep = {"kernel": P(), "bias": P()}
    layer = {
        "q": col, "k": col, "v": col,
        "attn_out": row, "attn_ln": _ln(),
        "ffn_in": col, "ffn_out": row, "ffn_ln": _ln(),
    }
    return {
        "embeddings": {
            "word": P(), "position": P(), "token_type": P(), "ln": _ln(),
        },
        "layers": [layer for _ in params["layers"]],
        "mlm_head": {
            "transform_dense": rep, "transform_ln": _ln(),
            "decoder_bias": P(),
        },
        "cls_projection": {
            "dense_to_hidden": rep, "ln": _ln(), "dense_to_output": rep,
        },
    }


def check_tp_divisibility(dims: BertDims, model_size: int) -> None:
    if dims.num_heads % model_size:
        raise ValueError(
            f"num_heads={dims.num_heads} not divisible by model axis {model_size}"
        )
    if dims.intermediate_size % model_size:
        raise ValueError(
            f"intermediate_size={dims.intermediate_size} not divisible by "
            f"model axis {model_size}"
        )


def shard_bert_tp(
    params: Params,
    mesh: Mesh,
    dims: BertDims,
    model_axis: str = MODEL_AXIS,
) -> Params:
    """Place BERT params TP-sharded on the mesh (replicated over ``data``)."""
    check_tp_divisibility(dims, mesh.shape[model_axis])
    specs = bert_tp_specs(params, model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_tp_text_encode(
    dims: BertDims,
    mesh: Mesh,
    normalize: bool = True,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
    dtype=None,
):
    """jitted (sharded params, (B, S) ids, (B, S) mask) -> (B, proj) CLS
    projections, batch sharded over ``data``, TP over ``model``.  ``dtype``
    composes with TP (``jnp.bfloat16`` = bf16 layer stack, fp32 softmax/LN,
    see ``models/cxr_bert.py::bert_encode``)."""
    import jax.numpy as jnp

    check_tp_divisibility(dims, mesh.shape[model_axis])
    batch_sh = NamedSharding(mesh, P(data_axis, None))
    dtype = dtype or jnp.float32

    @jax.jit
    def encode(params, input_ids, attention_mask):
        input_ids = jax.lax.with_sharding_constraint(input_ids, batch_sh)
        attention_mask = jax.lax.with_sharding_constraint(attention_mask, batch_sh)
        return get_projected_text_embeddings(
            params, input_ids, attention_mask, dims, normalize=normalize, dtype=dtype
        )

    return encode
