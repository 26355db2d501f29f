"""Pipeline-parallel (GPipe-style) sharding for the CXR-BERT text tower.

Fourth scale-out axis, completing the dp/tp/sp family: shard the layer
*stack* over a ``pipe`` mesh axis.  Each device holds ``num_layers /
pipe`` contiguous encoder blocks (the reference keeps all 12 on one GPU,
``health_multimodal/text/model/modelling_cxrbert.py:52-115``); a batch is
split into microbatches that stream through the stages, so at steady
state every stage computes a different microbatch concurrently and only
per-stage weights + one microbatch of activations are resident per
device.

TPU-native schedule, not a framework runtime: the whole pipeline is ONE
jitted ``shard_map`` program.  A ``lax.scan`` over ``M + P - 1`` ticks
(M microbatches, P stages — the P-1 extra ticks are the classic GPipe
fill/drain bubble) advances every stage in lockstep; activations hop to
the next stage via ``lax.ppermute`` (neighbour ICI), the first stage
embeds its next microbatch each tick, the last stage banks its [CLS]
column, and a final ``psum`` over the pipe axis replicates the result
(every other stage contributed zeros).  No scheduler thread, no
send/recv runtime — the compiler sees the entire schedule and overlaps
the permutes with stage compute.

During fill/drain, stages whose microbatch index is out of range compute
on clamped garbage and their writes are predicated off — the standard
static-shape trade under ``jit`` (branchless beats dynamic control flow
on TPU).

Composes with data parallelism on a ``(data, pipe)`` mesh: batches shard
over ``data``, stages over ``pipe``.  Like sp (and unlike tp's pure
GSPMD placements) this is ``shard_map`` because a pipeline schedule is
an algorithm the partitioner cannot derive from shardings.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    BertDims,
    attention_mask_bias,
    cls_projection,
    embed_inputs,
    encoder_layer,
)
from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"

Params = dict


def create_mesh_pp(
    data: int,
    pipe: int,
    devices=None,
    data_axis: str = DATA_AXIS,
    pipe_axis: str = PIPE_AXIS,
) -> Mesh:
    """(data x pipe) mesh; ``pipe`` is the fast-varying axis so stage
    handoffs hop neighbouring ICI links."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if len(devices) < data * pipe:
        raise ValueError(f"need {data * pipe} devices, have {len(devices)}")
    grid = np.asarray(devices[: data * pipe]).reshape(data, pipe)
    return Mesh(grid, (data_axis, pipe_axis))


def stack_layer_params(params: Params) -> Params:
    """List of per-layer dicts -> one dict pytree with a leading layer axis
    (the axis the pipe mesh shards and each stage's ``lax.scan`` walks)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])


def check_pp_shapes(
    dims: BertDims, batch: int, n_microbatches: int, mesh: Mesh,
    data_axis: str = DATA_AXIS, pipe_axis: str = PIPE_AXIS,
) -> None:
    n_data = mesh.shape[data_axis]
    n_pipe = mesh.shape[pipe_axis]
    if dims.num_layers % n_pipe:
        raise ValueError(
            f"num_layers={dims.num_layers} not divisible by pipe axis {n_pipe}"
        )
    if batch % n_data:
        raise ValueError(f"batch {batch} not divisible by data axis {n_data}")
    if (batch // n_data) % n_microbatches:
        raise ValueError(
            f"per-data-shard batch {batch // n_data} not divisible by "
            f"n_microbatches={n_microbatches}"
        )


def make_pp_text_encode(
    dims: BertDims,
    mesh: Mesh,
    n_microbatches: int,
    normalize: bool = True,
    data_axis: str = DATA_AXIS,
    pipe_axis: str = PIPE_AXIS,
    dtype: Optional[jnp.dtype] = None,
):
    """jitted (replicated params, (B, S) ids, (B, S) mask) -> (B, proj) CLS
    projections; layer stack sharded over ``pipe``, batch over ``data``.

    Embeddings and the (tiny) projection head are replicated; the encoder
    blocks — all the FLOPs and nearly all the weights — are stage-sharded.
    ``dtype`` composes as everywhere else (bf16 layer stack; fp32
    softmax/LN moments, [CLS] banking, and projection head).
    """
    from jax import shard_map

    n_pipe = mesh.shape[pipe_axis]
    compute_dtype = dtype or jnp.float32
    m_count = n_microbatches

    def _local(stacked_layers, shared, ids, mask):
        s_idx = jax.lax.axis_index(pipe_axis)
        b, s = ids.shape
        mb = b // m_count
        ids_mb = ids.reshape(m_count, mb, s)
        mask_mb = mask.reshape(m_count, mb, s)
        perm = [(i, i + 1) for i in range(n_pipe - 1)]

        def stage_apply(x, mask_bias):
            def body(h, lp):
                return encoder_layer(lp, h, mask_bias, dims), None

            y, _ = jax.lax.scan(body, x, stacked_layers)
            return y

        def tick(carry, t):
            held, out = carry
            m_idx = t - s_idx  # microbatch this stage works on at tick t
            m_c = jnp.clip(m_idx, 0, m_count - 1)
            ids_t = jax.lax.dynamic_index_in_dim(ids_mb, m_c, 0, keepdims=False)
            mask_t = jax.lax.dynamic_index_in_dim(mask_mb, m_c, 0, keepdims=False)
            x0 = embed_inputs(shared, ids_t, dtype=compute_dtype)
            x_in = jnp.where(s_idx == 0, x0, held)
            y = stage_apply(x_in, attention_mask_bias(mask_t))
            # hand off to the next stage (stage 0 receives zeros, unused)
            held_next = (
                jax.lax.ppermute(y, pipe_axis, perm) if n_pipe > 1 else y
            )
            # last stage banks its [CLS] column during the valid window
            cls = y[:, 0, :].astype(jnp.float32)
            write = (s_idx == n_pipe - 1) & (m_idx >= 0) & (m_idx < m_count)
            prev = jax.lax.dynamic_index_in_dim(out, m_c, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, cls, prev), m_c, 0
            )
            return (held_next, out), None

        held0 = jnp.zeros((mb, s, dims.hidden_size), compute_dtype)
        out0 = jnp.zeros((m_count, mb, dims.hidden_size), jnp.float32)
        (_, out), _ = jax.lax.scan(
            tick, (held0, out0), jnp.arange(m_count + n_pipe - 1)
        )
        # only the last stage wrote non-zeros; psum replicates the result
        out = jax.lax.psum(out, pipe_axis)
        return out.reshape(b, dims.hidden_size)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(), P(data_axis, None), P(data_axis, None)),
        out_specs=P(data_axis, None),
        check_vma=False,
    )

    @jax.jit
    def encode(params, input_ids, attention_mask):
        check_pp_shapes(dims, input_ids.shape[0], m_count, mesh,
                        data_axis, pipe_axis)
        stacked = stack_layer_params(params)
        shared = {k: v for k, v in params.items() if k != "layers"}
        cls_hidden = sharded(stacked, shared, input_ids, attention_mask)
        proj = cls_projection(params, cls_hidden)
        if normalize:
            proj = proj / jnp.maximum(
                jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12
            )
        return proj

    return encode
