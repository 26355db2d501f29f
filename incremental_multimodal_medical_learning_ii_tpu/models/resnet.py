"""ResNet-50 trunk (BioViL image encoder backbone), TPU-native.

Architecture parity with the torchvision-v1 ResNet-50 the reference vendors
(``health_multimodal/image/model/resnet.py:50-80``: Bottleneck [3,4,6,3],
stride on the 3x3 conv, 1x1-conv downsample), re-expressed for TPU:

* NHWC layout and HWIO kernels (XLA's native conv layout on TPU);
* inference-mode batch norm folded to a single multiply-add (the encoder is
  always frozen in this workload — the reference freezes it for extraction,
  ``chexpert-get-embedding.py:41-42``, and never runs it during training);
* a ``dtype`` knob for bfloat16 conv compute with fp32 parameters/statistics.

Params are plain nested pytrees (dict/list), so the torch weight converter
is a mechanical transpose and the whole forward jits into one XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

BN_EPS = 1e-5  # torch BatchNorm2d default
RESNET50_LAYERS = (3, 4, 6, 3)
RESNET18_LAYERS = (2, 2, 2, 2)
RESNET50_WIDTHS = (64, 128, 256, 512)
EXPANSION = 4  # Bottleneck; BasicBlock (resnet18) has expansion 1


# ----------------------------------------------------------------------
# Primitives
# ----------------------------------------------------------------------
def conv2d(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int, padding: int, dilation: int = 1
) -> jnp.ndarray:
    # Precision is pinned: JAX's default conv precision truncates fp32
    # operands (~1e-2 error vs torch).  Speed is controlled by the compute
    # dtype instead — bfloat16 inputs use the bf16 MXU path regardless.
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def conv_apply(p: Params, x: jnp.ndarray, stride: int, padding: int, dilation: int = 1) -> jnp.ndarray:
    """Apply one conv param group.  The forward functions thread this as a
    ``conv`` argument so alternative executions (int8 MXU path, ops/quant.py)
    reuse the exact block/layer structure instead of duplicating it."""
    return conv2d(x, p["kernel"], stride, padding, dilation)


def space_to_depth_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index = (r%2)*2 + (c%2)
    blocks of C (the layout :func:`space_to_depth_stem_kernel` targets)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def space_to_depth_stem_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Rearrange the stem's (7, 7, C, N) stride-2 kernel into the exact
    (4, 4, 4C, N) stride-1 kernel over 2x2 space-to-depth input.

    The 7x7-s2 conv reads rows 2*oi-3 .. 2*oi+3; in half-resolution
    coordinates r = 2*(oi - 2 + a) + pr those are a in 0..3, parity pr in
    {0, 1}, i.e. a 4x4 window with offset -2..1 (conv padding (2, 1)).
    Tap (a, pr) maps to original kernel row 2a + pr - 1 (out of range ->
    structural zero: only the (a=0, pr=0) corner).  Same for columns.  The
    math is EXACT — only the MXU contraction depth changes (K: C*49 ->
    4C*16, both cover the same 49 taps).
    """
    kh, kw, c, n = kernel.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"expected a 7x7 stem kernel, got {kernel.shape}")
    w4 = jnp.zeros((4, 4, 4 * c, n), kernel.dtype)
    for a in range(4):
        for pr in range(2):
            u = 2 * a + pr - 1  # original kernel row
            if not 0 <= u <= 6:
                continue
            for b in range(4):
                for pc in range(2):
                    v = 2 * b + pc - 1
                    if not 0 <= v <= 6:
                        continue
                    ch = (pr * 2 + pc) * c
                    w4 = w4.at[a, b, ch : ch + c, :].set(kernel[u, v])
    return w4


def stem_conv_apply(p: Params, x: jnp.ndarray, conv=conv_apply) -> jnp.ndarray:
    """The stem conv, dispatching on kernel shape: a (4, 4, 4C, N) kernel
    (from :func:`space_to_depth_stem_kernel`) runs the space-to-depth
    formulation — stride-1, padding (2, 1) — otherwise the standard
    7x7-s2-p3 conv."""
    k = p.get("kernel") if hasattr(p, "get") else None
    if k is not None and k.shape[0] == 4:
        xs = space_to_depth_2x2(x)
        return jax.lax.conv_general_dilated(
            xs,
            k.astype(xs.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
    return conv(p, x, 2, 3)


def batch_norm_inference(x: jnp.ndarray, bn: Params) -> jnp.ndarray:
    """Frozen BN: precomputable scale/shift, evaluated in fp32 statistics."""
    scale = (bn["scale"] / jnp.sqrt(bn["var"] + BN_EPS)).astype(x.dtype)
    shift = (bn["bias"] - bn["mean"] * bn["scale"] / jnp.sqrt(bn["var"] + BN_EPS)).astype(x.dtype)
    return x * scale + shift


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


# ----------------------------------------------------------------------
# Initialisation (random weights; production weights come from the converter)
# ----------------------------------------------------------------------
def _init_conv(key, kh, kw, cin, cout) -> Params:
    # torch kaiming_normal_(fan_out, relu)
    fan_out = kh * kw * cout
    std = np.sqrt(2.0 / fan_out)
    return {"kernel": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std}


def _init_bn(c) -> Params:
    return {
        "scale": jnp.ones(c, jnp.float32),
        "bias": jnp.zeros(c, jnp.float32),
        "mean": jnp.zeros(c, jnp.float32),
        "var": jnp.ones(c, jnp.float32),
    }


def _init_bottleneck(key, cin, width, stride) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cout = width * EXPANSION
    block: Params = {
        "conv1": _init_conv(k1, 1, 1, cin, width),
        "bn1": _init_bn(width),
        "conv2": _init_conv(k2, 3, 3, width, width),
        "bn2": _init_bn(width),
        "conv3": _init_conv(k3, 1, 1, width, cout),
        "bn3": _init_bn(cout),
    }
    if stride != 1 or cin != cout:
        block["downsample_conv"] = _init_conv(k4, 1, 1, cin, cout)
        block["downsample_bn"] = _init_bn(cout)
    return block


def _init_basic_block(key, cin, width, stride) -> Params:
    """torchvision BasicBlock (resnet18): two 3x3 convs, expansion 1."""
    k1, k2, k3 = jax.random.split(key, 3)
    block: Params = {
        "conv1": _init_conv(k1, 3, 3, cin, width),
        "bn1": _init_bn(width),
        "conv2": _init_conv(k2, 3, 3, width, width),
        "bn2": _init_bn(width),
    }
    if stride != 1 or cin != width:
        block["downsample_conv"] = _init_conv(k3, 1, 1, cin, width)
        block["downsample_bn"] = _init_bn(width)
    return block


def init_resnet50(key: jax.Array) -> Params:
    keys = jax.random.split(key, 1 + len(RESNET50_LAYERS))
    params: Params = {
        "conv1": _init_conv(keys[0], 7, 7, 3, 64),
        "bn1": _init_bn(64),
    }
    cin = 64
    for li, (blocks, width) in enumerate(zip(RESNET50_LAYERS, RESNET50_WIDTHS)):
        stride = 1 if li == 0 else 2
        bkeys = jax.random.split(keys[1 + li], blocks)
        layer: List[Params] = []
        for bi in range(blocks):
            layer.append(_init_bottleneck(bkeys[bi], cin, width, stride if bi == 0 else 1))
            cin = width * EXPANSION
        params[f"layer{li + 1}"] = layer
    return params


def init_resnet18(key: jax.Array) -> Params:
    """ResNet-18 trunk (the reference's other supported encoder,
    ``health_multimodal/image/model/resnet.py:63-71``; no dilation — the
    reference raises for resnet18 there too, ``model.py:211-213``)."""
    keys = jax.random.split(key, 1 + len(RESNET18_LAYERS))
    params: Params = {
        "conv1": _init_conv(keys[0], 7, 7, 3, 64),
        "bn1": _init_bn(64),
    }
    cin = 64
    for li, (blocks, width) in enumerate(zip(RESNET18_LAYERS, RESNET50_WIDTHS)):
        stride = 1 if li == 0 else 2
        bkeys = jax.random.split(keys[1 + li], blocks)
        layer: List[Params] = []
        for bi in range(blocks):
            layer.append(_init_basic_block(bkeys[bi], cin, width, stride if bi == 0 else 1))
            cin = width
        params[f"layer{li + 1}"] = layer
    return params


# ----------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------
def _basic_block_forward(block: Params, x: jnp.ndarray, stride: int, conv=conv_apply) -> jnp.ndarray:
    out = conv(block["conv1"], x, stride, 1)
    out = jax.nn.relu(batch_norm_inference(out, block["bn1"]))
    out = conv(block["conv2"], out, 1, 1)
    out = batch_norm_inference(out, block["bn2"])
    if "downsample_conv" in block:
        identity = conv(block["downsample_conv"], x, stride, 0)
        identity = batch_norm_inference(identity, block["downsample_bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _bottleneck_forward(
    block: Params, x: jnp.ndarray, stride: int, dilation: int = 1, conv=conv_apply
) -> jnp.ndarray:
    out = conv(block["conv1"], x, 1, 0)
    out = jax.nn.relu(batch_norm_inference(out, block["bn1"]))
    out = conv(block["conv2"], out, stride, dilation, dilation)
    out = jax.nn.relu(batch_norm_inference(out, block["bn2"]))
    out = conv(block["conv3"], out, 1, 0)
    out = batch_norm_inference(out, block["bn3"])
    if "downsample_conv" in block:
        identity = conv(block["downsample_conv"], x, stride, 0)
        identity = batch_norm_inference(identity, block["downsample_bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def resnet50_forward(
    params: Params,
    x: jnp.ndarray,
    dtype: jnp.dtype = jnp.float32,
    return_intermediates: bool = False,
    replace_stride_with_dilation: Sequence[bool] = (False, False, False),
    conv=conv_apply,
    layer1_fn=None,
):
    """NHWC forward; returns x4 (B, H/32, W/32, 2048), or the x0..x4 tuple
    (``ResNetHIML.forward``, resnet.py:25-47).

    ``replace_stride_with_dilation`` follows torchvision semantics for
    layers 2-4 (the capability behind the vendored
    ``reload_encoder_with_dilation``, ``model.py:207-227``; default there is
    (False, False, True)): the layer's stride becomes 1, its first block
    convolves at the previous dilation, subsequent blocks at the doubled
    dilation.

    ``layer1_fn``, if given, replaces the whole stride-1 layer1 block chain
    (hook for the fused pallas kernel, ``ops/pallas_bottleneck.py``).
    """
    x = x.astype(dtype)
    x0 = stem_conv_apply(params["conv1"], x, conv=conv)
    x0 = jax.nn.relu(batch_norm_inference(x0, params["bn1"]))
    x0 = max_pool_3x3_s2(x0)
    feats = [x0]
    out = x0
    dilation = 1
    for li in range(4):
        stride = 1 if li == 0 else 2
        prev_dilation = dilation
        if li > 0 and replace_stride_with_dilation[li - 1]:
            dilation *= stride
            stride = 1
        if li == 0 and layer1_fn is not None:
            out = layer1_fn(out)
            feats.append(out)
            continue
        for bi, block in enumerate(params[f"layer{li + 1}"]):
            out = _bottleneck_forward(
                block,
                out,
                stride if bi == 0 else 1,
                prev_dilation if bi == 0 else dilation,
                conv=conv,
            )
        feats.append(out)
    if return_intermediates:
        return tuple(feats)
    return out


def resnet18_forward(
    params: Params,
    x: jnp.ndarray,
    dtype: jnp.dtype = jnp.float32,
    return_intermediates: bool = False,
    conv=conv_apply,
):
    """ResNet-18 NHWC forward (BasicBlocks); x4 is (B, H/32, W/32, 512)."""
    x = x.astype(dtype)
    x0 = conv(params["conv1"], x, 2, 3)
    x0 = jax.nn.relu(batch_norm_inference(x0, params["bn1"]))
    x0 = max_pool_3x3_s2(x0)
    feats = [x0]
    out = x0
    for li in range(4):
        stride = 1 if li == 0 else 2
        for bi, block in enumerate(params[f"layer{li + 1}"]):
            out = _basic_block_forward(block, out, stride if bi == 0 else 1, conv=conv)
        feats.append(out)
    if return_intermediates:
        return tuple(feats)
    return out
