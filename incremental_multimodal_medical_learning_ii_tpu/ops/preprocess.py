"""CXR preprocessing: the BioViL pipeline, host-parity and on-device forms.

Reference pipeline (``DataRetrieval.py:175-180`` / ``get_bio_vil_pipeline``):
ToPILImage -> Resize(size) -> CenterCrop(size) -> ToTensor (/255) ->
ExpandChannels (1->3).  The vendored engine variant also percentile-remaps
raw arrays to uint8 first (``health_multimodal/image/data/io.py:16-47``).

Two implementations:

* :func:`preprocess_host` — exact reference semantics via PIL, for parity
  harnesses and single-image inference;
* :func:`preprocess_device` — the TPU path: host supplies padded raw uint8
  images + per-image PIL-parity resize matrices (see ops/resize.py); the
  device does resize (2 MXU matmuls) + center crop + /255 + 3-channel
  expansion in one fused XLA program, batched.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.ops.resize import (
    apply_uint8_rounding,
    batched_matmul_resize,
    resize_matrix,
    resize_shape_for_smaller_edge,
)


def _normalize_and_expand(resized: jnp.ndarray, channels: int) -> jnp.ndarray:
    """ToTensor (/255) + optional ExpandChannels — the one finalization all
    device preprocess paths share (keeps the shared-size fast path
    bit-identical to the per-image path by construction)."""
    out = (resized / 255.0)[..., None]
    if channels == 1:
        return out
    return jnp.broadcast_to(out, (*out.shape[:3], channels))


# ----------------------------------------------------------------------
# Host reference path (PIL)
# ----------------------------------------------------------------------
def remap_to_uint8(array: np.ndarray, percentiles: Optional[Tuple[float, float]] = None) -> np.ndarray:
    """Min-max (or percentile-clipped) remap to [0, 255] uint8
    (``image/data/io.py:16-47``)."""
    array = array.astype(float)
    if percentiles is not None:
        if len(percentiles) != 2:
            raise ValueError(
                "The value for percentiles should be a sequence of length 2,"
                f" but has length {len(percentiles)}"
            )
        a, b = percentiles
        if a >= b:
            raise ValueError(f'Percentiles must be in ascending order, but a sequence "{percentiles}" was passed')
        if a < 0 or b > 100:
            raise ValueError(f'Percentiles must be in the range [0, 100], but a sequence "{percentiles}" was passed')
        cutoff = np.percentile(array, percentiles)
        array = np.clip(array, *cutoff)
    array -= array.min()
    mx = array.max()
    if mx > 0:
        array /= mx
    array *= 255
    return array.astype(np.uint8)


def center_crop_bounds(h: int, w: int, crop: int) -> Tuple[int, int]:
    """torchvision CenterCrop corner: int(round((dim - crop) / 2))."""
    top = int(round((h - crop) / 2.0))
    left = int(round((w - crop) / 2.0))
    return top, left


def _effective_crop_start(out: int, crop: int) -> int:
    """Fused resize+crop row start for one dim, INCLUDING torchvision's
    pad-when-smaller rule: CenterCrop first pads by floor((crop-out)/2) then
    crops at offset 0, so the content start is -((crop-out)//2) — NOT the
    banker's-rounded negative bound (round((out-crop)/2) differs by one
    whenever crop-out is 3 mod 4, e.g. out=89, crop=96: -3 vs -4)."""
    if out >= crop:
        return int(round((out - crop) / 2.0))
    return -((crop - out) // 2)


def preprocess_host(image_u8: np.ndarray, size: int = 512, crop: Optional[int] = None) -> np.ndarray:
    """(H, W) uint8 -> (crop, crop, 3) float32 in [0,1]; exact reference
    pipeline via PIL (Resize smaller edge -> CenterCrop -> /255 -> 3ch)."""
    from PIL import Image

    crop = crop or size
    pil = Image.fromarray(image_u8, mode="L")
    h, w = image_u8.shape
    out_h, out_w = resize_shape_for_smaller_edge(h, w, size)
    pil = pil.resize((out_w, out_h), Image.BILINEAR)
    arr = np.asarray(pil)
    top, left = center_crop_bounds(out_h, out_w, crop)
    if top < 0 or left < 0 or out_h < crop or out_w < crop:  # pad if smaller
        padded = np.zeros((max(out_h, crop), max(out_w, crop)), np.uint8)
        py, px = (padded.shape[0] - out_h) // 2, (padded.shape[1] - out_w) // 2
        padded[py : py + out_h, px : px + out_w] = arr
        arr = padded
        top, left = center_crop_bounds(arr.shape[0], arr.shape[1], crop)
    arr = arr[top : top + crop, left : left + crop]
    out = (arr.astype(np.float32) / 255.0)[..., None]
    return np.repeat(out, 3, axis=-1)


# ----------------------------------------------------------------------
# Device path
# ----------------------------------------------------------------------
class DevicePreprocessPlan:
    """Host-side plan for a batch of raw images with heterogeneous sizes.

    Builds the static padded raw buffer and per-image PIL-parity resize
    matrices targeting a (resize_max, resize_max) canvas whose central
    (crop, crop) window is the reference's Resize+CenterCrop output.
    """

    def __init__(self, size: int = 512, crop: Optional[int] = None, pad_to: int = 1024):
        self.size = size
        self.crop = crop or size
        self.pad_to = pad_to

    def prepare(self, images: Sequence[np.ndarray]):
        """images: list of (H, W) uint8 -> (raw (B,P,P) u8, w_h, w_w arrays).

        Each image's resize target (out_h, out_w) differs; we build weight
        matrices directly for the *cropped* window, fusing CenterCrop into
        the resize matrices (rows/cols outside the crop are simply omitted),
        so the device output is (B, crop, crop) straight away.
        """
        b = len(images)
        p = self.pad_to
        raw = np.zeros((b, p, p), np.uint8)
        w_h = np.zeros((b, self.crop, p), np.float32)
        w_w = np.zeros((b, self.crop, p), np.float32)
        for i, img in enumerate(images):
            h, w = img.shape
            if h > p or w > p:
                raise ValueError(f"image {i} ({h}x{w}) exceeds pad_to={p}")
            raw[i, :h, :w] = img
            w_h[i], w_w[i] = self._matrices(h, w)
        return raw, w_h, w_w

    # enough for any real dataset's shape variety; the eviction budget is in
    # BYTES, not entries — entry size scales with crop*pad_to, so an entry
    # count alone would let adversarially shape-varied requests to a
    # long-lived server pin ~1 GB on a 1-vCPU host (256 entries x ~4 MB)
    _MATRIX_CACHE_MAX = 256
    _MATRIX_CACHE_MAX_BYTES = 256 * 1024 * 1024

    def _matrices(self, h: int, w: int):
        """Cropped resize-matrix pair for one raw shape, LRU-cached per
        shape (images repeat shapes heavily; the matrices are pure
        functions of (h, w, size, crop, pad_to))."""
        cached = getattr(self, "_matrix_cache", None)
        if cached is None:
            from collections import OrderedDict

            cached = self._matrix_cache = OrderedDict()
            self._matrix_cache_bytes = 0
        pair = cached.get((h, w))
        if pair is not None:
            cached.move_to_end((h, w))
        if pair is None:
            entry_bytes = 2 * self.crop * self.pad_to * 4  # the pair below
            while cached and (
                len(cached) >= self._MATRIX_CACHE_MAX
                or self._matrix_cache_bytes + entry_bytes > self._MATRIX_CACHE_MAX_BYTES
            ):
                _, old = cached.popitem(last=False)
                self._matrix_cache_bytes -= old[0].nbytes + old[1].nbytes
            out_h, out_w = resize_shape_for_smaller_edge(h, w, self.size)
            top = _effective_crop_start(out_h, self.crop)
            left = _effective_crop_start(out_w, self.crop)
            full_h = resize_matrix(h, out_h, padded_in=self.pad_to)
            full_w = resize_matrix(w, out_w, padded_in=self.pad_to)
            # fuse the center crop: keep only the crop window's rows/cols
            pair = cached[(h, w)] = (
                _crop_rows(full_h, top, self.crop),
                _crop_rows(full_w, left, self.crop),
            )
            self._matrix_cache_bytes += pair[0].nbytes + pair[1].nbytes
        return pair

    def prepare_deduped(self, images: Sequence[np.ndarray]):
        """Like :meth:`prepare`, but ships ONE matrix pair per DISTINCT
        image shape plus a per-image index: ``(raw (B,P,P) u8,
        uniq_w_h (U,crop,P), uniq_w_w (U,crop,P), idx (B,) i32)``.

        Why: the dense per-image pairs are ~4 MB/image — 30x the raw
        pixels — which murders an upload-bandwidth-bound link when a batch
        mixes shapes.  Real batches repeat a handful of shapes, so U << B.
        ``U`` is padded to the next power of two (capped at B) with zero
        matrices so the device program compiles once per bucket, not once
        per distinct U.
        """
        b = len(images)
        p = self.pad_to
        raw = np.zeros((b, p, p), np.uint8)
        idx = np.zeros(b, np.int32)
        order: dict = {}
        for i, img in enumerate(images):
            h, w = img.shape
            if h > p or w > p:
                raise ValueError(f"image {i} ({h}x{w}) exceeds pad_to={p}")
            raw[i, :h, :w] = img
            key = (h, w)
            if key not in order:
                order[key] = len(order)
            idx[i] = order[key]
        u = len(order)
        u_pad = 1
        while u_pad < u:
            u_pad *= 2
        u_pad = min(u_pad, b)
        uniq_w_h = np.zeros((u_pad, self.crop, p), np.float32)
        uniq_w_w = np.zeros((u_pad, self.crop, p), np.float32)
        for (h, w), j in order.items():
            uniq_w_h[j], uniq_w_w[j] = self._matrices(h, w)
        return raw, uniq_w_h, uniq_w_w, idx


def _crop_rows(mat: np.ndarray, start: int, crop: int) -> np.ndarray:
    """Rows [start, start+crop) of the resize matrix, zero-padded where the
    crop extends past the resized image (CenterCrop pads with black)."""
    out = np.zeros((crop, mat.shape[1]), mat.dtype)
    src_lo = max(start, 0)
    src_hi = min(start + crop, mat.shape[0])
    dst_lo = src_lo - start
    out[dst_lo : dst_lo + (src_hi - src_lo)] = mat[src_lo:src_hi]
    return out


def preprocess_device(
    raw: jnp.ndarray, w_h: jnp.ndarray, w_w: jnp.ndarray, channels: int = 3
) -> jnp.ndarray:
    """(B, P, P) u8 + per-image weights -> (B, crop, crop, C) float32 [0,1].

    One fused XLA program: 2 batched MXU matmuls (resize+crop), uint8
    rounding parity, /255, channel broadcast.  ``channels=1`` keeps the
    grayscale plane un-expanded for the folded-conv1 encoder
    (:func:`models.biovil_image.fold_grayscale_conv1`).
    """
    resized = batched_matmul_resize(raw, w_h, w_w, round_uint8=True)
    return _normalize_and_expand(resized, channels)


def preprocess_device_indexed(
    raw: jnp.ndarray,
    uniq_w_h: jnp.ndarray,
    uniq_w_w: jnp.ndarray,
    idx: jnp.ndarray,
    channels: int = 3,
) -> jnp.ndarray:
    """(B,P,P) u8 + (U,crop,P) unique weights + (B,) index -> preprocessed
    batch.  The per-image matrices are gathered ON DEVICE from the U unique
    pairs (see :meth:`DevicePreprocessPlan.prepare_deduped`), so the host
    uploads U matrix pairs instead of B."""
    return preprocess_device(raw, uniq_w_h[idx], uniq_w_w[idx], channels=channels)


class SharedSizePreprocessPlan:
    """Fast path for uniform-size batches (CheXpert-small is mostly one
    geometry): one weight-matrix pair shared by the whole batch, so the
    host->device transfer per image is just the raw uint8 pixels."""

    def __init__(self, height: int, width: int, size: int = 512, crop: Optional[int] = None):
        self.height, self.width = height, width
        self.size = size
        self.crop = crop or size
        out_h, out_w = resize_shape_for_smaller_edge(height, width, size)
        top = _effective_crop_start(out_h, self.crop)
        left = _effective_crop_start(out_w, self.crop)
        self.w_h = _crop_rows(resize_matrix(height, out_h), top, self.crop)
        self.w_w = _crop_rows(resize_matrix(width, out_w), left, self.crop)

    def prepare(self, images: Sequence[np.ndarray]) -> np.ndarray:
        raw = np.stack(images)
        if raw.shape[1:] != (self.height, self.width):
            raise ValueError(f"expected {(self.height, self.width)} images, got {raw.shape[1:]}")
        return raw


def preprocess_device_shared(
    raw: jnp.ndarray, w_h: jnp.ndarray, w_w: jnp.ndarray, channels: int = 3
) -> jnp.ndarray:
    """(B, H, W) u8 with one shared (crop, H) / (crop, W) matrix pair."""
    x = raw.astype(jnp.float32)
    out = jnp.einsum("oh,bhw->bow", w_h, x, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bow,pw->bop", out, w_w, precision=jax.lax.Precision.HIGHEST)
    return _normalize_and_expand(apply_uint8_rounding(out), channels)


def expand_channels(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 1) -> (..., 3) (``ExpandChannels``, DataRetrieval.py:27-40)."""
    if x.shape[-1] != 1:
        raise ValueError(f"Expected trailing channel dim 1, found {x.shape}")
    return jnp.broadcast_to(x, (*x.shape[:-1], 3))
