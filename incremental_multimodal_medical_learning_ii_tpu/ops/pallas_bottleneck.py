"""Pallas fused ResNet bottleneck *layer* for the frozen extraction trunk.

Why: the per-stage device attribution (docs/DESIGN.md) shows layer1 of the
512x512 extraction forward running at ~12% MFU — XLA executes each conv
separately, round-tripping every intermediate activation through HBM
(~90 MB/image for layer1 against the 10.5 MB an ideally-fused layer moves).
This kernel runs ALL blocks of a stride-1 bottleneck layer (layer1:
3 blocks, 64->256 channels at 128x128) inside one pallas_call: activations
stay in VMEM, HBM sees one read of x and one write of y.

Design (see /opt/skills/guides/pallas_guide.md):

* grid over (batch, row-tiles); each program DMAs a row slab of the
  zero-padded input (halo = one row per 3x3 conv = n_blocks rows each side)
  from HBM into VMEM and computes the whole block chain on it, shrinking
  the valid rows by one per block; the output tile is written through a
  regular blocked out_spec;
* 1x1 convs are flat (rows*W, Cin) x (Cin, Cout) MXU dots; the 3x3 conv is
  three dx-grouped (rows*W, 3C) x (3C, C) dots summed into one fp32
  accumulator (the best K the Mosaic concat rules allow — see
  ``_conv3x3_im2col``);
* frozen BatchNorm is folded into the conv weights/biases on host
  (:func:`fold_bottleneck_layer`), so the kernel is dots + bias + relu only;
* W-axis padding for the 3x3 is zero-concat in VMEM (the tile spans the
  full image width, so zero columns are the true image boundary);
* compute dtype bf16 with fp32 accumulation (``preferred_element_type``).

The reference executes this as stock torchvision bottlenecks
(``health_multimodal/image/model/resnet.py:25-47``); parity is to the
block math, not to torch's scheduling.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.models.resnet import BN_EPS

Params = Dict[str, Any]


# ----------------------------------------------------------------------
# Host-side preparation: fold BN, reshape kernels for the MXU
# ----------------------------------------------------------------------
def _fold_conv_bn(kernel: jnp.ndarray, bn: Params):
    """HWIO conv kernel + frozen BN -> scaled kernel and bias."""
    k = jnp.asarray(kernel, jnp.float32)
    scale = bn["scale"] / jnp.sqrt(bn["var"] + BN_EPS)
    bias = bn["bias"] - bn["mean"] * scale
    return k * scale, bias


def fold_bottleneck_layer(layer: List[Params]) -> Dict[str, list]:
    """Fold a stride-1 bottleneck layer's BN into MXU-shaped weights.

    Returns per-block lists: w1 (Cin, Cm), w2 (9*Cm, Cm), w3 (Cm, Cout),
    b1/b2 (1, Cm), b3 (1, Cout) [conv3 bias + downsample bias combined for
    block 0], plus wd (Cin, Cout) for the downsample block.
    """
    out: Dict[str, list] = {k: [] for k in ("w1", "b1", "w2", "b2", "w3", "b3", "wd")}
    for bi, block in enumerate(layer):
        k1, b1 = _fold_conv_bn(block["conv1"]["kernel"], block["bn1"])
        k2, b2 = _fold_conv_bn(block["conv2"]["kernel"], block["bn2"])
        k3, b3 = _fold_conv_bn(block["conv3"]["kernel"], block["bn3"])
        cm = k1.shape[3]
        out["w1"].append(k1.reshape(k1.shape[2], cm).astype(jnp.bfloat16))
        # (H=3, W=3, Cm, Cm) -> dx-major (3*(3*Cm), Cm): the kernel runs one
        # K=3*Cm dot per dx group (dy-taps concatenated channel-wise)
        out["w2"].append(
            k2.transpose(1, 0, 2, 3).reshape(9 * cm, cm).astype(jnp.bfloat16)
        )
        out["w3"].append(k3.reshape(cm, k3.shape[3]).astype(jnp.bfloat16))
        out["b1"].append(b1.reshape(1, -1).astype(jnp.float32))
        out["b2"].append(b2.reshape(1, -1).astype(jnp.float32))
        if "downsample_conv" in block:
            kd, bd = _fold_conv_bn(block["downsample_conv"]["kernel"], block["downsample_bn"])
            out["wd"].append(kd.reshape(kd.shape[2], kd.shape[3]).astype(jnp.bfloat16))
            b3 = b3 + bd  # one combined bias for the residual sum
        out["b3"].append(b3.reshape(1, -1).astype(jnp.float32))
    return out


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------
def _conv3x3_im2col(t: jnp.ndarray, w2: jnp.ndarray, rows_out: int) -> jnp.ndarray:
    """t: (h, W, C) bf16 -> fp32 (rows_out*W, C); zero W-padding.

    Three accumulated (rows*W, 3C) x (3C, C) dx-group dots (``w2`` is
    dx-major, see :func:`fold_bottleneck_layer`).  A single K=9C im2col
    dot would feed the MXU best, but Mosaic cannot lower the 9-way
    channel concat of shifted slices ("result/input offset mismatch on
    non-concat dimension"): dx shifts move the sublane offset.  Within a
    dx group the three dy-taps differ only along the UNTILED row axis, so
    their channel concat lowers, and K=3C triples the systolic-depth
    utilisation over per-tap K=C dots.
    """
    h, w, c = t.shape
    z = jnp.zeros((h, 1, c), t.dtype)
    tp = jnp.concatenate([z, t, z], axis=1)  # (h, W+2, C)
    acc = None
    for dx in range(3):
        group = jnp.concatenate(
            [tp[dy : dy + rows_out, dx : dx + w, :] for dy in range(3)], axis=-1
        ).reshape(rows_out * w, 3 * c)
        tap = w2[dx * 3 * c : (dx + 1) * 3 * c, :]
        d = jnp.dot(group, tap, preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _layer_kernel(n_blocks: int, rows: int, width: int, x_hbm, *refs):
    """refs: [w1,b1,w2,b2,w3,b3]*n_blocks, wd, y_ref, x_vmem, sem."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    per = 6
    wrefs = refs[: per * n_blocks]
    wd_ref = refs[per * n_blocks]
    y_ref = refs[per * n_blocks + 1]
    x_vmem = refs[per * n_blocks + 2]
    sem = refs[per * n_blocks + 3]

    b = pl.program_id(0)
    r = pl.program_id(1)
    halo = n_blocks
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * rows, rows + 2 * halo)], x_vmem, sem
    )
    dma.start()
    dma.wait()

    img_h = pl.num_programs(1) * rows
    t = x_vmem[:]  # (rows + 2*halo, W, Cin) bf16
    for bi in range(n_blocks):
        w1, b1, w2, b2, w3, b3 = wrefs[per * bi : per * (bi + 1)]
        h, w, cin = t.shape
        flat = t.reshape(h * w, cin)
        a = jnp.dot(flat, w1[:], preferred_element_type=jnp.float32)
        a = jax.nn.relu(a + b1[:]).astype(jnp.bfloat16).reshape(h, w, width)
        # conv2 zero-pads ITS input at image boundaries (torch padding=1):
        # halo rows outside the image must be zero after conv1+bias+relu,
        # not relu(b1).  Interior tiles have no out-of-image rows.
        row_g = r * rows - (halo - bi) + jax.lax.broadcasted_iota(
            jnp.int32, (h, 1, 1), 0
        )
        a = jnp.where((row_g >= 0) & (row_g < img_h), a, jnp.bfloat16(0))
        rows_out = h - 2
        a = _conv3x3_im2col(a, w2[:], rows_out)
        a = jax.nn.relu(a + b2[:]).astype(jnp.bfloat16)
        a = jnp.dot(a, w3[:], preferred_element_type=jnp.float32) + b3[:]
        ident = t[1 : h - 1]  # rows matching the conv2 shrink
        if bi == 0:
            ident = jnp.dot(
                ident.reshape(rows_out * w, cin), wd_ref[:],
                preferred_element_type=jnp.float32,
            )
        else:
            ident = ident.reshape(rows_out * w, -1).astype(jnp.float32)
        t = jax.nn.relu(a + ident).astype(jnp.bfloat16).reshape(rows_out, w, -1)
    y_ref[:] = t[None]


def fused_bottleneck_layer(
    x: jnp.ndarray,
    folded: Dict[str, list],
    *,
    rows_per_tile: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, H, W, Cin) bf16 -> (B, H, W, Cout) through the fused layer.

    Stride-1 layers only (layer1 geometry); ``H`` must divide by
    ``rows_per_tile`` (default: 32, clamped to H).  ``interpret=None``
    auto-selects the pallas interpreter off-TPU so the same call works
    in CPU tests.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # the tunneled TPU backend is named "axon"; anything without a
        # Mosaic lowering runs the pallas interpreter
        interpret = jax.default_backend() not in ("tpu", "axon")
    if rows_per_tile is None:
        # largest divisor of H that is <= 32: 128 -> 32, but the vendored
        # 480-crop geometry gives layer1 H=120 -> 30 (a bare min(32, H)
        # would raise on any H not divisible by 32)
        rows_per_tile = next(r for r in range(min(32, x.shape[1]), 0, -1)
                             if x.shape[1] % r == 0)
    n_blocks = len(folded["w1"])
    bsz, h, w, cin = x.shape
    cout = folded["w3"][0].shape[1]
    width = folded["w1"][0].shape[1]
    rows = rows_per_tile
    if h % rows:
        raise ValueError(f"H={h} not divisible by rows_per_tile={rows}")
    halo = n_blocks
    x = x.astype(jnp.bfloat16)
    # Mosaic requires the DMA slice's lane (channel) extent aligned to the
    # 128-lane tiling; layer1's Cin=64 is not.  Zero-pad channels and the
    # matching w1/wd rows — exact math, ~0.6 MB extra DMA per tile.
    cpad = (-cin) % 128
    xpad = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, cpad)))
    w1_0 = jnp.pad(folded["w1"][0], ((0, cpad), (0, 0)))
    wd_0 = jnp.pad(folded["wd"][0], ((0, cpad), (0, 0)))
    cin += cpad

    weights = []
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # x stays in HBM
    for bi in range(n_blocks):
        for key in ("w1", "b1", "w2", "b2", "w3", "b3"):
            weights.append(w1_0 if (key, bi) == ("w1", 0) else folded[key][bi])
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    weights.append(wd_0)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(_layer_kernel, n_blocks, rows, width)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rows, w, cout), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * halo, w, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        # the unrolled block chain's live temporaries exceed the default
        # 16 MB scoped-vmem budget at rows_per_tile >= 32
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xpad, *weights)
