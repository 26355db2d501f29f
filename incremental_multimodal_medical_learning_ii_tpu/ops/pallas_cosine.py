"""Pallas TPU kernel: fused L2-normalise + cosine scoring.

The prompt scorer's hot op is ``cos(X, T) = norm(X) @ norm(T)^T`` for
X (B, 128) image embeddings against the tiny prompt bank T (<=128 rows).
This kernel fuses both normalisations into the MXU matmul pass: X tiles
stream HBM -> VMEM once, the bank stays resident in VMEM across the whole
grid, and no normalised intermediate is ever materialised in HBM (the
unfused XLA path writes norm(X) back at B=6144).

Used by the scorer when shapes are TPU-tile-friendly; the pure-jnp path
(ops/cosine.py) remains the reference implementation and the fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8
_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cosine_kernel(x_ref, t_ref, o_ref):
    x = x_ref[:]
    t = t_ref[:]
    # rsqrt-free normalisation to match the jnp reference bit-for-bit-ish:
    # x / max(||x||, eps)
    xn = x / jnp.maximum(jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)), EPS)
    tn = t / jnp.maximum(jnp.sqrt(jnp.sum(t * t, axis=1, keepdims=True)), EPS)
    o_ref[:] = jax.lax.dot_general(
        xn,
        tn,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def pallas_pairwise_cosine(
    x: jnp.ndarray,
    t: jnp.ndarray,
    block_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, D) x (T, D) -> (B, T) cosine similarities, fused on TPU.

    Pads B to the block size and T/D to hardware tiles; padding rows have
    zero norm and produce zero similarity (sliced off before returning).
    """
    b, d = x.shape
    tt, d2 = t.shape
    assert d == d2, (x.shape, t.shape)

    bp = _round_up(b, block_b)
    tp = _round_up(tt, _LANE)
    dp = _round_up(d, _LANE)
    x_pad = jnp.zeros((bp, dp), jnp.float32).at[:b, :d].set(x.astype(jnp.float32))
    t_pad = jnp.zeros((tp, dp), jnp.float32).at[:tt, :d].set(t.astype(jnp.float32))

    out = pl.pallas_call(
        _cosine_kernel,
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, tp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, tp), jnp.float32),
        interpret=interpret,
    )(x_pad, t_pad)
    return out[:b, :tt]


def pallas_pairwise_cosine_sharded(
    mesh,
    x: jnp.ndarray,
    t: jnp.ndarray,
    axis_name: str = "data",
    block_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mesh variant: rows of ``x`` sharded over ``axis_name``, bank ``t``
    replicated; each device runs the fused kernel on its shard (pallas_call
    cannot take sharded operands under whole-array jit — shard_map gives it
    per-device views)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def per_shard(xs, ts):
        return pallas_pairwise_cosine(xs, ts, block_b=block_b, interpret=interpret)

    return shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(None, None)),
        out_specs=P(axis_name, None),
        check_vma=False,
    )(x, t)
