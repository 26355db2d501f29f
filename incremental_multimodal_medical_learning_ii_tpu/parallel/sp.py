"""Sequence-parallel (ring-attention) sharding for the CXR-BERT text tower.

Third scale-out axis for the text encoder, alongside data parallelism
(``parallel/mesh.py``) and tensor parallelism (``parallel/tp.py``): shard
the *sequence* dimension over a mesh axis.  The reference encodes reports
on a single device (``health_multimodal/text/inference_engine.py:50-70``)
so its sequence length is capped by one GPU's memory; here each device
holds ``S / seq`` tokens, every per-token op (embeddings, LayerNorm, FFN,
Q/K/V projections) runs purely locally under ``shard_map``, and the one
cross-token op — attention — runs as an exact ring
(``ops/ring_attention.py``): K/V chunks hop around the ``seq`` axis via
``lax.ppermute`` (neighbour ICI traffic) while the softmax accumulates
online.  Peak activation memory per device falls from O(S) to O(S/seq)
and the (S x S) score matrix never materialises anywhere.

Unlike the TP module (pure GSPMD sharding annotations), this path is
``shard_map`` because ring attention is an explicitly scheduled collective
algorithm — the compiler cannot derive the rotate-and-accumulate pattern
from a sharding annotation.

Composition: the mesh may carry a ``data`` axis too — batches shard over
``data`` and tokens over ``seq`` in the same program.  Combining sp with
TP head-sharding in one program is out of scope (the prompt banks that
dominate this workload are short; sp exists for full-report encoding).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    BertDims,
    bert_encode,
    cls_projection,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.ring_attention import (
    ring_attention_core,
)
from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import DATA_AXIS

SEQ_AXIS = "seq"

Params = dict


def create_mesh_sp(
    data: int,
    seq: int,
    devices=None,
    data_axis: str = DATA_AXIS,
    seq_axis: str = SEQ_AXIS,
) -> Mesh:
    """(data x seq) mesh; ``seq`` is the fast-varying axis so the ring's
    ppermute hops ride neighbouring ICI links."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < data * seq:
        raise ValueError(f"need {data * seq} devices, have {len(devices)}")
    grid = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(grid, (data_axis, seq_axis))


def pad_tokens_for_sp(input_ids, attention_mask, seq_shards: int):
    """Pad (B, S) ids/mask on the sequence axis to a multiple of the seq
    mesh size (id 0, mask 0 — the ring masks padded kv exactly like the
    dense path's additive bias).  Returns numpy arrays."""
    ids = np.asarray(input_ids)
    mask = np.asarray(attention_mask)
    s = ids.shape[1]
    s_pad = ((s + seq_shards - 1) // seq_shards) * seq_shards
    if s_pad != s:
        ids = np.pad(ids, ((0, 0), (0, s_pad - s)))
        mask = np.pad(mask, ((0, 0), (0, s_pad - s)))
    return ids, mask


def check_sp_shapes(dims: BertDims, batch: int, seq_len: int, mesh: Mesh,
                    data_axis: str = DATA_AXIS, seq_axis: str = SEQ_AXIS) -> None:
    n_data = mesh.shape[data_axis]
    n_seq = mesh.shape[seq_axis]
    if batch % n_data:
        raise ValueError(f"batch {batch} not divisible by data axis {n_data}")
    if seq_len % n_seq:
        raise ValueError(
            f"seq len {seq_len} not divisible by seq axis {n_seq} "
            f"(pad with pad_tokens_for_sp)"
        )
    if seq_len > dims.max_position_embeddings:
        raise ValueError(
            f"seq len {seq_len} exceeds max_position_embeddings="
            f"{dims.max_position_embeddings}"
        )


def make_sp_text_encode(
    dims: BertDims,
    mesh: Mesh,
    normalize: bool = True,
    data_axis: str = DATA_AXIS,
    seq_axis: str = SEQ_AXIS,
    dtype: Optional[jnp.dtype] = None,
):
    """jitted (replicated params, (B, S) ids, (B, S) mask) -> (B, proj)
    CLS projections with the batch sharded over ``data`` and the sequence
    over ``seq``.

    Each device runs ``bert_encode`` on its local (B/data, S/seq) token
    shard with the ring-attention core and a position-embedding offset of
    ``axis_index(seq) * S/seq``; the tiny CLS projection head runs after
    the shard_map on the (replicated-weight) [CLS] column, which lives on
    the seq-shard 0 devices.  ``dtype`` composes as everywhere else (bf16
    layer stack, fp32 softmax/LN/ring accumulator and projection head).
    """
    from jax import shard_map

    n_seq = mesh.shape[seq_axis]
    compute_dtype = dtype or jnp.float32

    core = functools.partial(ring_attention_core, axis_name=seq_axis, n_shards=n_seq)

    def _local(params, ids_l, mask_l):
        sl = ids_l.shape[1]
        offset = jax.lax.axis_index(seq_axis).astype(jnp.int32) * sl
        return bert_encode(
            params, ids_l, mask_l, dims,
            dtype=compute_dtype, attention_core=core, position_offset=offset,
        )

    sharded_encode = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(data_axis, seq_axis), P(data_axis, seq_axis)),
        out_specs=P(data_axis, seq_axis, None),
        check_vma=False,
    )

    @jax.jit
    def encode(params, input_ids, attention_mask):
        check_sp_shapes(dims, input_ids.shape[0], input_ids.shape[1], mesh,
                        data_axis, seq_axis)
        hidden = sharded_encode(params, input_ids, attention_mask)
        proj = cls_projection(params, hidden[:, 0, :].astype(jnp.float32))
        if normalize:
            proj = proj / jnp.maximum(
                jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12
            )
        return proj

    return encode
