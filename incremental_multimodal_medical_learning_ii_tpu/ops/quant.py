"""Int8 inference path for the frozen BioViL extraction trunk.

The extraction encoder never trains (the reference freezes it,
``chexpert-get-embedding.py:41-42`` / ``model.py:131-139``), so
post-training quantization applies cleanly.  TPU MXUs execute int8 at twice
the bf16 rate and int8 activations halve the HBM traffic of the
memory-bound early ResNet layers at 512x512, which is where the profile
says the time goes.

Scheme (standard symmetric PTQ):

* **weights**: per-output-channel symmetric int8, folded once on host
  (:func:`quantize_resnet_int8`) — scale = max|w| / 127 over (kh, kw, cin);
* **activations**: dynamic per-tensor symmetric int8, computed on device
  per conv input (one fused max-reduction over a tensor XLA already has in
  registers);
* **accumulation**: int32 on the MXU (``preferred_element_type``), dequantized
  to the network's elementwise dtype before batch-norm/ReLU/residual adds, so
  everything outside the convs is bit-identical to the bf16 path.

The 1x1-conv projector stays in bf16/fp32: it is ~0.3% of the FLOPs and its
output feeds the mean-pooled embedding directly, where quantization noise
would land unattenuated.

This path is opt-in (``extract_embeddings(..., int8=True)``): embeddings
shift by the quantization error (cosine ~0.999 vs the fp path on real-scale
inputs), which is fine for retrieval/classification but not for bit-parity
gates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.models.resnet import Params


def quantize_conv_int8(p: Params) -> Params:
    """{'kernel': (kh,kw,cin,cout) fp32} -> int8 kernel + per-cout scale."""
    k = jnp.asarray(p["kernel"], jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0  # (cout,)
    scale = jnp.maximum(scale, 1e-12)
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    out = dict(p)
    out["kernel_q"] = kq
    out["w_scale"] = scale
    del out["kernel"]
    return out


def quantize_resnet_int8(params: Params) -> Params:
    """Quantize every conv kernel in a resnet-style param tree (dicts with a
    'kernel' key and no bias -> conv; lists -> block lists; 'bn*' untouched)."""

    def walk(node):
        if isinstance(node, list):
            return [walk(n) for n in node]
        if isinstance(node, dict):
            if "kernel" in node and node["kernel"].ndim == 4:
                return quantize_conv_int8(node)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def conv_apply_int8(p: Params, x: jnp.ndarray, stride: int, padding: int, dilation: int = 1) -> jnp.ndarray:
    """Int8 MXU conv: dynamic per-tensor activation scale, per-channel weight
    scales, int32 accumulation, dequant back to ``x.dtype``.  Drop-in for
    :func:`models.resnet.conv_apply` via the forwards' ``conv`` argument."""
    x32 = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        p["kernel_q"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_x * p["w_scale"])
    return out.astype(x.dtype)
