"""CXR-BERT text encoder, TPU-native.

Parity target: the vendored ``CXRBertModel``
(``health_multimodal/text/model/modelling_cxrbert.py:52-141``) — a
HuggingFace ``BertForMaskedLM`` whose *last hidden state* [CLS] vector is
passed through a projection head (Linear hidden->128, GELU, LayerNorm
eps=1e-12, Linear 128->128, ``modelling_cxrbert.py:36-49``) to produce the
128-d joint-space text embedding (NOT normalised on the training path,
``Trainer.py:1660`` calls with normalize=False).

The implementation is a plain functional BERT encoder over pytree params:
static shapes (callers pad to 'longest' within a bank, see text/engine.py),
exact GELU, fp32 attention softmax.  The MLM head is included for
``predict_masked_tokens`` capability parity
(``text/inference_engine.py:84-119``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

LN_EPS = 1e-12
_HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class BertDims:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    projection_size: int = 128

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny_bert_dims(**kw) -> BertDims:
    """Small dims for tests."""
    defaults = dict(
        vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, projection_size=16,
    )
    defaults.update(kw)
    return BertDims(**defaults)


# ----------------------------------------------------------------------
# Init (random; production weights come from the converter)
# ----------------------------------------------------------------------
def _init_linear(key, din, dout) -> Params:
    k1, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(k1, (din, dout), jnp.float32) * 0.02,
        "bias": jnp.zeros(dout, jnp.float32),
    }


def _init_ln(d) -> Params:
    return {"scale": jnp.ones(d, jnp.float32), "bias": jnp.zeros(d, jnp.float32)}


def init_cxr_bert(key: jax.Array, dims: BertDims) -> Params:
    keys = jax.random.split(key, dims.num_layers + 6)
    h, i = dims.hidden_size, dims.intermediate_size
    params: Params = {
        "embeddings": {
            "word": jax.random.normal(keys[0], (dims.vocab_size, h), jnp.float32) * 0.02,
            "position": jax.random.normal(keys[1], (dims.max_position_embeddings, h), jnp.float32) * 0.02,
            "token_type": jax.random.normal(keys[2], (dims.type_vocab_size, h), jnp.float32) * 0.02,
            "ln": _init_ln(h),
        },
        "layers": [],
        "mlm_head": {
            "transform_dense": _init_linear(keys[3], h, h),
            "transform_ln": _init_ln(h),
            "decoder_bias": jnp.zeros(dims.vocab_size, jnp.float32),
        },
        "cls_projection": {
            "dense_to_hidden": _init_linear(keys[4], h, dims.projection_size),
            "ln": _init_ln(dims.projection_size),
            "dense_to_output": _init_linear(keys[5], dims.projection_size, dims.projection_size),
        },
    }
    for li in range(dims.num_layers):
        lk = jax.random.split(keys[6 + li], 6)
        layer = {
            "q": _init_linear(lk[0], h, h),
            "k": _init_linear(lk[1], h, h),
            "v": _init_linear(lk[2], h, h),
            "attn_out": _init_linear(lk[3], h, h),
            "attn_ln": _init_ln(h),
            "ffn_in": _init_linear(lk[4], h, i),
            "ffn_out": _init_linear(lk[5], i, h),
            "ffn_ln": _init_ln(h),
        }
        params["layers"].append(layer)
    return params


# ----------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------
def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # kernel follows the activation dtype (bf16 fast path casts weights at
    # the matmul operand load); precision pinned as everywhere else — it is
    # a near-no-op for bf16 operands but prevents fp32 truncation.
    out = jnp.matmul(x, p["kernel"].astype(x.dtype), precision=_HIGHEST)
    return out + p["bias"].astype(out.dtype)


def _layer_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # moment accumulation always in fp32 (bit-identical for fp32 inputs,
    # numerically required for the bf16 fast path)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) / jnp.sqrt(var + LN_EPS) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _self_attention(
    layer: Params,
    x: jnp.ndarray,
    mask_bias: jnp.ndarray,
    dims: BertDims,
    use_flash: bool = False,
    fuse_qkv: bool = False,
    attention_core=None,
) -> jnp.ndarray:
    b, s, h = x.shape
    nh, hd = dims.num_heads, dims.head_dim

    def split_heads(t):
        return t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)  # (B, nh, S, hd)

    if fuse_qkv:
        # One (B*S, H) x (H, 3H) matmul instead of three (H, H) dots.
        # Bit-identical to the separate path: each output column of a
        # matmul is an independent dot over the SAME contraction axis, so
        # concatenating the kernels changes neither values nor rounding
        # (fp32 parity tests cover both paths).
        #
        # MEASURED (v5e, BERT-base, batch 256 x seq 32, chained-scan
        # long-minus-short, min-of-3): a consistent ~1.5% LOSS — bf16
        # 14.8k fused vs 15.0k unfused prompts/s; fp32 4.12k vs 4.16k.
        # XLA already feeds the three (8192,768)x(768,768) dots at ~80%
        # MFU (the fp32-vs-bf16 pair solves the split: ~8.9 ms matmul +
        # ~8.1 ms dtype-independent fp32 elementwise per batch), so the
        # fused dot saves nothing and the per-call kernel concat costs.
        # Kept opt-in for backends where dispatch overhead dominates.
        qkv_kernel = jnp.concatenate(
            [layer["q"]["kernel"], layer["k"]["kernel"], layer["v"]["kernel"]], axis=1
        )
        qkv_bias = jnp.concatenate(
            [layer["q"]["bias"], layer["k"]["bias"], layer["v"]["bias"]]
        )
        qkv = jnp.matmul(x, qkv_kernel.astype(x.dtype), precision=_HIGHEST)
        qkv = qkv + qkv_bias.astype(qkv.dtype)
        q, k, v = (split_heads(t) for t in jnp.split(qkv, 3, axis=-1))
    else:
        q = split_heads(_linear(layer["q"], x))
        k = split_heads(_linear(layer["k"], x))
        v = split_heads(_linear(layer["v"], x))
    if attention_core is not None:
        # Pluggable (q, k, v, mask_bias) -> ctx — the hook the
        # sequence-parallel ring path uses (ops/ring_attention.py via
        # parallel/sp.py); the Q/K/V and output projections stay shared.
        ctx = attention_core(q, k, v, mask_bias)
    elif use_flash:
        # Pallas TPU flash-attention kernel (online softmax, no S x S
        # materialisation).  Pointless at prompt lengths (<50 tokens) but
        # the right path for full radiology reports; enabled via
        # bert_encode(use_flash_attention=True).  Key padding rides the
        # kernel's segment_ids — an ab bias would materialise the
        # (B, nh, S, S) tensor the kernel exists to avoid (3+ GB at
        # report lengths).  Padded QUERY rows attend only padding (their
        # outputs are garbage either way and never consumed: the CLS
        # projection reads position 0, MLM fill reads real positions).
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        valid = (mask_bias[:, 0, 0, :] == 0).astype(jnp.int32)  # (B, S)
        ctx = flash_attention(
            q, k, v, segment_ids=SegmentIds(q=valid, kv=valid),
            sm_scale=1.0 / float(np.sqrt(hd)),
        )
    else:
        scores = jnp.einsum("bnqd,bnkd->bnqk", q, k, precision=_HIGHEST) / np.sqrt(hd)
        scores = scores + mask_bias  # (B, 1, 1, S) additive
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bnqk,bnkd->bnqd", probs, v, precision=_HIGHEST)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
    return _linear(layer["attn_out"], ctx)


def embed_inputs(
    params: Params,
    input_ids: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    dtype: jnp.dtype = jnp.float32,
    position_offset=0,
) -> jnp.ndarray:
    """Word + position + token-type embeddings, LayerNormed: (B, S) -> (B, S, H).

    ``position_offset`` (int or traced scalar) shifts the position-embedding
    slice for callers whose ``input_ids`` are a sequence shard (parallel/sp.py).
    """
    s = input_ids.shape[1]
    emb = params["embeddings"]
    if isinstance(position_offset, int) and position_offset == 0:
        pos = emb["position"][None, :s]
    else:
        pos = jax.lax.dynamic_slice_in_dim(emb["position"], position_offset, s)[None]
    x = emb["word"][input_ids] + pos
    tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
    x = x + emb["token_type"][tt]
    return _layer_norm(emb["ln"], x).astype(dtype)


def attention_mask_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """HF-style additive mask (B, 1, 1, S): 0 attended, finfo.min padded."""
    return (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * jnp.finfo(
        jnp.float32
    ).min


def encoder_layer(
    layer: Params,
    x: jnp.ndarray,
    mask_bias: jnp.ndarray,
    dims: BertDims,
    use_flash: bool = False,
    fuse_qkv: bool = False,
    attention_core=None,
) -> jnp.ndarray:
    """One post-LN BERT encoder block: attention + residual LN + FFN +
    residual LN.  The unit the pipeline-parallel path scans over
    (parallel/pp.py) — extracted from the ``bert_encode`` loop, identical
    math."""
    attn = _self_attention(layer, x, mask_bias, dims,
                           use_flash=use_flash, fuse_qkv=fuse_qkv,
                           attention_core=attention_core)
    x = _layer_norm(layer["attn_ln"], x + attn)
    ffn = _linear(layer["ffn_out"], jax.nn.gelu(_linear(layer["ffn_in"], x), approximate=False))
    return _layer_norm(layer["ffn_ln"], x + ffn)


def bert_encode(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    dims: BertDims,
    token_type_ids: Optional[jnp.ndarray] = None,
    use_flash_attention: bool = False,
    dtype: jnp.dtype = jnp.float32,
    fuse_qkv: bool = False,
    attention_core=None,
    position_offset=0,
) -> jnp.ndarray:
    """(B, S) ids + mask -> (B, S, H) last hidden state.

    ``dtype=jnp.bfloat16`` runs the layer-stack matmuls in bf16 (the same
    parity-default / speed-opt-in design as the image encoders'' ``dtype``
    knob); softmax and LayerNorm moments always accumulate in fp32.
    ``fuse_qkv`` issues Q/K/V as one (H, 3H) matmul — bit-identical math,
    measured a ~1.5% LOSS on v5e (see :func:`_self_attention`); opt-in for
    dispatch-bound backends.  ``attention_core`` swaps the attention inner
    op (sequence-parallel ring path, parallel/sp.py); ``position_offset``
    (int or traced scalar) offsets the position-embedding slice for callers
    whose ``input_ids`` are a sequence *shard*."""
    x = embed_inputs(params, input_ids, token_type_ids, dtype=dtype,
                     position_offset=position_offset)
    mask_bias = attention_mask_bias(attention_mask)
    for layer in params["layers"]:
        x = encoder_layer(layer, x, mask_bias, dims,
                          use_flash=use_flash_attention, fuse_qkv=fuse_qkv,
                          attention_core=attention_core)
    return x


def cls_projection(params: Params, cls_hidden: jnp.ndarray) -> jnp.ndarray:
    """BertProjectionHead (modelling_cxrbert.py:36-49)."""
    p = params["cls_projection"]
    h = _linear(p["dense_to_hidden"], cls_hidden)
    h = jax.nn.gelu(h, approximate=False)
    h = _layer_norm(p["ln"], h)
    return _linear(p["dense_to_output"], h)


def get_projected_text_embeddings(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    dims: BertDims,
    normalize: bool = False,
    dtype: jnp.dtype = jnp.float32,
    fuse_qkv: bool = False,
    use_flash_attention: bool = False,
) -> jnp.ndarray:
    """(B, S) -> (B, projection_size); [CLS] of the last hidden state through
    the projection head (modelling_cxrbert.py:117-141).  ``dtype`` selects
    the layer-stack compute dtype; the tiny projection head and the L2
    normalisation always run in fp32.  ``use_flash_attention`` selects the
    pallas online-softmax path — for the O(S^2) score memory it avoids at
    report lengths, not for speed (measured 474 vs 687 dense prompts/s at
    seq 512, batch 32, bf16; `bench_all --text-long`)."""
    hidden = bert_encode(params, input_ids, attention_mask, dims, dtype=dtype,
                         fuse_qkv=fuse_qkv,
                         use_flash_attention=use_flash_attention)
    proj = cls_projection(params, hidden[:, 0, :].astype(jnp.float32))
    if normalize:
        proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
    return proj


def mlm_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """BertForMaskedLM prediction head: transform + tied-embedding decoder."""
    head = params["mlm_head"]
    h = _linear(head["transform_dense"], hidden)
    h = jax.nn.gelu(h, approximate=False)
    h = _layer_norm(head["transform_ln"], h)
    word = params["embeddings"]["word"]
    return jnp.matmul(h, word.T, precision=_HIGHEST) + head["decoder_bias"]
