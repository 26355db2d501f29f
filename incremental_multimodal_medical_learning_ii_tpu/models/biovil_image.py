"""BioViL image model: ResNet-50 trunk + 1x1-conv MLP projector.

Parity target: ``health_multimodal/image/model/model.py:141-154`` — the
trunk's x4 feature map goes through a 1x1-conv projector (Conv2d 2048->128
no-bias, BatchNorm2d(128), ReLU, Conv2d 128->128 with bias,
``modules.py:30-49``) giving per-patch 128-d embeddings; the global
embedding is the mean over the patch grid, NOT L2-normalised (the cached
CheXpert embeddings are raw, ``chexpert-get-embedding.py:80-82``).

Also exposes the patch-wise embeddings used by the VLP phrase-grounding
engine (``model.py:160-174``: optional channel-dim L2 normalisation, grid
layout preserved).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
    Params,
    batch_norm_inference,
    conv2d,
    init_resnet50,
    resnet50_forward,
    _init_bn,
    _init_conv,
)

from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    JOINT_FEATURE_SIZE,  # single definition; adapters/config use the same
)

TRUNK_FEATURES = 2048


class ImageModelOutput(NamedTuple):
    projected_global_embedding: jnp.ndarray  # (B, 128), raw (not normalised)
    projected_patch_embeddings: jnp.ndarray  # (B, h, w, 128)
    img_embedding: jnp.ndarray  # (B, 2048) avg-pooled trunk features


def init_biovil_image_model(key: jax.Array) -> Params:
    k_trunk, k_p1, k_p2 = jax.random.split(key, 3)
    proj2 = _init_conv(k_p2, 1, 1, JOINT_FEATURE_SIZE, JOINT_FEATURE_SIZE)
    proj2["bias"] = jnp.zeros(JOINT_FEATURE_SIZE, jnp.float32)
    return {
        "encoder": init_resnet50(k_trunk),
        "projector": {
            "conv1": _init_conv(k_p1, 1, 1, TRUNK_FEATURES, JOINT_FEATURE_SIZE),
            "bn": _init_bn(JOINT_FEATURE_SIZE),
            "conv2": proj2,
        },
    }


def fold_grayscale_conv1(params: Params) -> Params:
    """Fold the 3-channel conv1 kernel for single-channel (grayscale) input.

    The reference pipeline's ``ExpandChannels`` (``DataRetrieval.py:27-40``)
    feeds the network three *identical* copies of the grayscale image, so
    ``conv1(repeat(x, 3), W) == conv1(x, sum_c W)`` exactly: summing the
    (7, 7, 3, 64) kernel over its input-channel axis to (7, 7, 1, 64) lets
    the extraction path keep images as (B, H, W, 1) — a third of the HBM
    traffic into conv1 and a third of its FLOPs — with no change in math
    (fp32 kernel sum; only the accumulation order differs).
    """
    k = params["encoder"]["conv1"]["kernel"]
    if k.shape[2] == 1:
        return params
    if k.shape[0] == 4:
        # space-to-depth stem kernel: its channel axis is s2d blocks, NOT
        # duplicated grayscale channels — summing it would corrupt the stem
        if k.shape[2] == 4:
            return params  # already grayscale-folded before the s2d transform
        raise ValueError(
            "cannot grayscale-fold a 3-channel space-to-depth stem kernel; "
            "apply fold_grayscale_conv1 BEFORE space_to_depth_stem"
        )
    folded = dict(params)
    folded["encoder"] = dict(params["encoder"])
    folded["encoder"]["conv1"] = {
        "kernel": jnp.sum(k.astype(jnp.float32), axis=2, keepdims=True)
    }
    return folded


def space_to_depth_stem(params: Params) -> Params:
    """Reformulate the stem conv for space-to-depth input (exact math).

    The 7x7-stride-2 conv1 with C_in=1 (grayscale-folded) feeds the MXU a
    K=49 contraction — under 40% of the 128-lane systolic depth; rearranged
    as a 4x4-stride-1 conv over 2x2 space-to-depth input the same 49 taps
    form a K=64 contraction on quarter-area spatial extent (see
    ``models/resnet.py::space_to_depth_stem_kernel``).  The forward
    dispatches on the kernel shape, so transformed params run everywhere
    (extraction, benches, serving) without signature changes.  Compose
    AFTER :func:`fold_grayscale_conv1`.
    """
    from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
        space_to_depth_stem_kernel,
    )

    k = params["encoder"]["conv1"]["kernel"]
    if k.shape[0] == 4:
        return params
    out = dict(params)
    out["encoder"] = dict(params["encoder"])
    out["encoder"]["conv1"] = {"kernel": space_to_depth_stem_kernel(k)}
    return out


def _projector_forward(proj: Params, patches: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(patches, proj["conv1"]["kernel"], 1, 0)
    h = jax.nn.relu(batch_norm_inference(h, proj["bn"]))
    h = conv2d(h, proj["conv2"]["kernel"], 1, 0) + proj["conv2"]["bias"].astype(h.dtype)
    return h


def quantize_biovil_int8(params: Params) -> Params:
    """Quantize the ResNet trunk to int8 (ops/quant.py); the tiny 1x1-conv
    projector stays in float — its output feeds the pooled embedding
    directly.  Use with ``biovil_image_forward(..., int8=True)``."""
    from incremental_multimodal_medical_learning_ii_tpu.ops.quant import (
        quantize_resnet_int8,
    )

    conv1 = params["encoder"]["conv1"].get("kernel")
    if conv1 is not None and conv1.shape[0] == 4:
        # stem_conv_apply dispatches the s2d path on the FLOAT kernel key;
        # quantization would strip it and silently run the 4x4 kernel with
        # 7x7-s2 geometry — refuse instead of failing deep inside XLA
        raise ValueError(
            "int8 quantization is incompatible with the space-to-depth stem; "
            "quantize the standard params, or skip space_to_depth_stem"
        )
    return {
        "encoder": quantize_resnet_int8(params["encoder"]),
        "projector": params["projector"],
    }


def biovil_image_forward(
    params: Params,
    images_nhwc: jnp.ndarray,
    dtype: jnp.dtype = jnp.float32,
    int8: bool = False,
    fused_layer1: bool = False,
) -> ImageModelOutput:
    """(B, H, W, 3) float images (the reference pipeline's [0,1] tensors)
    -> global + patch embeddings.  Mean/pool accumulations run in fp32 even
    under bfloat16 conv compute.  ``int8=True`` expects trunk params from
    :func:`quantize_biovil_int8` and runs the trunk convs on the int8 MXU
    path (2x peak, half the activation HBM traffic).  ``fused_layer1=True``
    runs layer1's 3-block chain through the VMEM-resident pallas kernel
    (``ops/pallas_bottleneck.py``) instead of XLA's per-conv schedule."""
    layer1_fn = None
    if fused_layer1:
        if int8:
            # quantize_biovil_int8 replaces float kernels with kernel_q/scale
            # pairs, which fold_bottleneck_layer cannot fold.
            raise ValueError("fused_layer1 is incompatible with the int8 trunk")
        if dtype != jnp.bfloat16:
            # the kernel computes in bf16 (fp32 accumulation); running it
            # inside an fp32 forward would silently downgrade layer1
            raise ValueError("fused_layer1 requires dtype=jnp.bfloat16")
        from incremental_multimodal_medical_learning_ii_tpu.ops.pallas_bottleneck import (
            fold_bottleneck_layer,
            fused_bottleneck_layer,
        )

        folded = fold_bottleneck_layer(params["encoder"]["layer1"])
        layer1_fn = lambda x: fused_bottleneck_layer(x, folded)  # noqa: E731
    if int8:
        from incremental_multimodal_medical_learning_ii_tpu.ops.quant import (
            conv_apply_int8,
        )

        patches = resnet50_forward(
            params["encoder"], images_nhwc, dtype=dtype, conv=conv_apply_int8,
            layer1_fn=layer1_fn,
        )
    else:
        patches = resnet50_forward(
            params["encoder"], images_nhwc, dtype=dtype, layer1_fn=layer1_fn
        )
    projected = _projector_forward(params["projector"], patches)
    projected32 = projected.astype(jnp.float32)
    global_emb = jnp.mean(projected32, axis=(1, 2))  # model.py:154 mean over grid
    pooled = jnp.mean(patches.astype(jnp.float32), axis=(1, 2))  # adaptive_avg_pool2d
    return ImageModelOutput(
        projected_global_embedding=global_emb,
        projected_patch_embeddings=projected32,
        img_embedding=pooled,
    )


def get_patchwise_projected_embeddings(
    params: Params, images_nhwc: jnp.ndarray, normalize: bool, dtype=jnp.float32
) -> jnp.ndarray:
    """(B, h, w, 128) patch embeddings, optionally L2-normalised over the
    feature dim (``model.py:160-174``; already BHWD here — NHWC native)."""
    out = biovil_image_forward(params, images_nhwc, dtype=dtype)
    patches = out.projected_patch_embeddings
    if normalize:
        norm = jnp.linalg.norm(patches, axis=-1, keepdims=True)
        patches = patches / jnp.maximum(norm, 1e-12)
    return patches
