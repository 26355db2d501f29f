"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference encodes full radiology reports on one device
(``health_multimodal/text/inference_engine.py`` — single ``cuda``/``cpu``
forward); sequence length there is capped only by memory.  This op is the
TPU-native way past that cap: shard the sequence over a mesh axis, keep
each device's Q chunk resident, and rotate the K/V chunks around the ring
with ``lax.ppermute`` while accumulating the softmax online (the
flash-attention recurrence, blocked over *devices* instead of VMEM tiles).
Per device it needs O(S/P) activation memory and the (Sl x Sl) score block
only, and every hop is a neighbour ppermute that rides the ICI — no
all-gather of the full sequence ever materialises.

Exact math, not an approximation: the online max/denominator rescaling
reproduces dense softmax(QK^T)V up to fp32 rounding (parity-tested against
``models/cxr_bert.py::_self_attention``'s dense path on an 8-device CPU
mesh, tests/test_sp.py).

Designed for use inside ``shard_map`` (see ``parallel/sp.py``); the caller
passes the mesh-axis name and its static size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST

# Large finite negative for masked scores.  NOT -inf / finfo.min: a block
# whose kv positions are ALL padding would then make `scores - rowmax`
# equal 0 (= weight 1) on garbage; with a finite fill the weights are
# explicitly zeroed by the `where` below and the running max stays finite.
_NEG = -0.7 * float(np.finfo(np.float32).max)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: jnp.ndarray,
    axis_name: str,
    n_shards: int,
    sm_scale: float,
) -> jnp.ndarray:
    """Sequence-parallel attention for one device's Q chunk.

    Args:
      q, k, v: ``(B, nh, Sl, hd)`` — this device's chunks of the sequence
        (``Sl = S / n_shards``).
      kv_valid: ``(B, Sl)`` bool/int — 1 where this device's kv positions
        are real tokens, 0 where padding.  Rotates with k/v.
      axis_name: mesh axis the sequence is sharded over.
      n_shards: static size of that axis (scan length must be static).
      sm_scale: softmax scale (``1/sqrt(hd)``).

    Returns ``(B, nh, Sl, hd)`` attention outputs for the local queries, in
    ``q.dtype``.  Scores and the accumulator run in fp32 regardless of the
    input dtype (same policy as the dense path's fp32 softmax).  Padded
    *query* rows attend only to whatever is valid and are never consumed by
    callers (CLS readout / MLM fill read real positions) — the same
    contract as the pallas flash path (models/cxr_bert.py:175-194).
    """
    b, nh, sl, hd = q.shape
    orig_dtype = q.dtype
    qf = q.astype(jnp.float32)
    # int32 (not bool) in the rotating carry: collective-permute of i1
    # buffers is not portable across all backends.
    valid0 = kv_valid.astype(jnp.int32)

    # Rotate chunks one hop per step: device j's kv buffer holds chunk
    # (j - t) mod P at step t, so after n_shards - 1 hops every device has
    # seen every chunk.  The final chunk is consumed WITHOUT a trailing
    # rotation — permuting the buffers back home would be a pure-overhead
    # hop costing 1/P of the ring's ICI traffic.
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    m0 = jnp.full((b, nh, sl), _NEG, jnp.float32)
    l0 = jnp.zeros((b, nh, sl), jnp.float32)
    o0 = jnp.zeros((b, nh, sl, hd), jnp.float32)

    def accumulate(m, l, o, k_c, v_c, valid_c):
        scores = (
            jnp.einsum("bnqd,bnkd->bnqk", qf, k_c.astype(jnp.float32),
                       precision=_HIGHEST)
            * sm_scale
        )
        vmask = valid_c[:, None, None, :] != 0
        scores = jnp.where(vmask, scores, _NEG)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        p = jnp.where(vmask, p, 0.0)  # masked-only blocks contribute 0
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        o_new = o * corr[..., None] + jnp.einsum(
            "bnqk,bnkd->bnqd", p, v_c.astype(jnp.float32), precision=_HIGHEST
        )
        return m_new, l_new, o_new

    def step(carry, _):
        m, l, o, k_c, v_c, valid_c = carry
        m_new, l_new, o_new = accumulate(m, l, o, k_c, v_c, valid_c)
        k_n = jax.lax.ppermute(k_c, axis_name, perm)
        v_n = jax.lax.ppermute(v_c, axis_name, perm)
        valid_n = jax.lax.ppermute(valid_c, axis_name, perm)
        return (m_new, l_new, o_new, k_n, v_n, valid_n), None

    (m, l, o, k_last, v_last, valid_last), _ = jax.lax.scan(
        step, (m0, l0, o0, k, v, valid0), None, length=n_shards - 1
    )
    m, l, o = accumulate(m, l, o, k_last, v_last, valid_last)
    out = o / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(orig_dtype)


def ring_attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_bias: jnp.ndarray,
    *,
    axis_name: str,
    n_shards: int,
) -> jnp.ndarray:
    """Adapter matching ``bert_encode``'s ``attention_core`` contract.

    ``mask_bias`` is the local chunk's HF-style additive bias
    ``(B, 1, 1, Sl)`` (0 attended / finfo.min padded) built by
    ``bert_encode`` from the LOCAL attention-mask shard; the ring carries
    the derived validity chunk around with k/v so every device masks every
    chunk correctly.
    """
    hd = q.shape[-1]
    kv_valid = mask_bias[:, 0, 0, :] == 0
    return ring_attention(
        q, k, v, kv_valid, axis_name, n_shards, sm_scale=1.0 / float(np.sqrt(hd))
    )
