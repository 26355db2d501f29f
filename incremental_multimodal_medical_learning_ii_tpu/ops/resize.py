"""PIL-parity antialiased bilinear resize, as MXU matmuls.

The reference resizes every CXR with ``torchvision.transforms.Resize`` on a
PIL image (``DataRetrieval.py:175-180``), i.e. PIL's antialiased bilinear
(triangle) filter applied separably with uint8 rounding.  That is exactly a
pair of sparse row/column weighting matrices — so on TPU we express the
resize as two dense matmuls, ``W_h @ img @ W_w^T``, which XLA maps straight
onto the MXU and fuses with the /255 normalisation and channel expansion.

For dynamically-sized source images (each CheXpert file has its own H, W)
the weight matrices are built on host per image (microseconds: a few
hundred floats) into static padded buffers, so the device computation keeps
one static shape for the whole extraction run.

``resize_matrix`` reproduces PIL's filter placement bit-for-bit:
support = max(1, in/out), centers at (i + 0.5) * in/out, triangle weights
normalised to sum 1 (see Pillow ``ImagingResampleHorizontal``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_matrix(in_size: int, out_size: int, padded_in: int | None = None) -> np.ndarray:
    """(out_size, padded_in) dense PIL-bilinear weight matrix."""
    padded_in = padded_in or in_size
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support
    w = np.zeros((out_size, padded_in), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        taps = np.arange(xmin, xmax)
        x = (taps - center + 0.5) / filterscale
        weights = np.clip(1.0 - np.abs(x), 0.0, None)  # triangle
        ssum = weights.sum()
        if ssum > 0:
            weights = weights / ssum
        w[i, xmin:xmax] = weights
    return w.astype(np.float32)


def resize_shape_for_smaller_edge(h: int, w: int, size: int) -> Tuple[int, int]:
    """torchvision ``Resize(int)``: scale the smaller edge to ``size``.

    The long edge TRUNCATES — ``int(size * long / short)`` in every
    torchvision backend (PIL path ``oh = int(size * h / w)``; tensor path
    ``_compute_resized_output_size``) — NOT round: 320x451 at size=512 is
    721, not 722.  Rounding here would shift the whole pixel grid vs the
    reference pipeline for any aspect ratio with fractional part >= .5."""
    if h <= w:
        return size, max(1, int(size * w / h))
    return max(1, int(size * h / w)), size


def apply_uint8_rounding(out: jnp.ndarray) -> jnp.ndarray:
    """PIL's uint8 output rounding (the reference resizes uint8 PIL images,
    so round-then-clip is part of the math).  THE one definition — every
    resize/preprocess path must share it, or a future parity fix would
    leave the other paths computing subtly different pixels."""
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def matmul_resize(
    img: jnp.ndarray, w_h: jnp.ndarray, w_w: jnp.ndarray, round_uint8: bool = True
) -> jnp.ndarray:
    """(H, W) x (outH, H) x (outW, W) -> (outH, outW); two MXU matmuls.

    ``round_uint8`` reproduces PIL's uint8 output rounding via
    :func:`apply_uint8_rounding`.
    """
    x = img.astype(jnp.float32)
    out = jnp.matmul(
        jnp.matmul(w_h, x, precision=jax.lax.Precision.HIGHEST),
        w_w.T,
        precision=jax.lax.Precision.HIGHEST,
    )
    if round_uint8:
        out = apply_uint8_rounding(out)
    return out


def batched_matmul_resize(
    imgs: jnp.ndarray, w_h: jnp.ndarray, w_w: jnp.ndarray, round_uint8: bool = True
) -> jnp.ndarray:
    """(B, Hp, Wp) images with per-image weight matrices (B, outH, Hp),
    (B, outW, Wp) -> (B, outH, outW)."""
    x = imgs.astype(jnp.float32)
    out = jnp.einsum("boh,bhw->bow", w_h, x, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bow,bpw->bop", out, w_w, precision=jax.lax.Precision.HIGHEST)
    if round_uint8:
        out = apply_uint8_rounding(out)
    return out
