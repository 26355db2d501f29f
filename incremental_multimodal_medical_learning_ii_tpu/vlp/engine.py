"""Joint image-text (VLP) inference: similarity scores and phrase grounding.

Capability parity with ``health_multimodal/vlp/inference_engine.py``:

* :meth:`get_similarity_score_from_raw_data` (``:30-57``): cosine between
  the image's global embedding (L2-normalised) and the mean text embedding
  of the query prompts (mean of raw embeddings, then L2-normalised);
* :meth:`get_similarity_map_from_raw_data` (``:59-91``): patch-embedding x
  text-embedding similarity grid, gaussian-smoothed (sigma=1.5), resized
  back to the original image geometry with NaN padding outside the crop
  (``:94-155``).

The gaussian smoothing runs on device as a small separable convolution; the
final geometric re-mapping is host-side numpy (it produces a per-image
visualisation, not a training tensor).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np



def _gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter's kernel (radius = truncate*sigma)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth_2d(grid: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """Separable gaussian blur matching ``scipy.ndimage.gaussian_filter``'s
    default boundary (scipy 'reflect' = edge-repeating = numpy 'symmetric',
    NOT numpy 'reflect')."""
    k = jnp.asarray(_gaussian_kernel_1d(sigma))
    r = (len(k) - 1) // 2

    def smooth_axis(x, axis):
        x = jnp.moveaxis(x, axis, -1)
        pad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(r, r)], mode="symmetric")
        out = jax.vmap(
            lambda row: jnp.correlate(
                row, k, mode="valid", precision=jax.lax.Precision.HIGHEST
            )
        )(pad.reshape(-1, pad.shape[-1])).reshape(x.shape)
        return jnp.moveaxis(out, -1, axis)

    return smooth_axis(smooth_axis(grid, 0), 1)


class ImageTextInferenceEngine:
    def __init__(self, image_params, text_engine, resize_size: int = 512,
                 crop_size: int = 480, dtype=None):
        """``text_engine``: a :class:`text.engine.TextInferenceEngine`.
        Default geometry matches the vendored engine factory
        (``image/utils.py:11-12``: resize 512 / crop 480).  The image side
        COMPOSES :class:`models.image_engine.ImageInferenceEngine` (the
        reference's ImageTextInferenceEngine likewise takes the image
        engine as a component, ``vlp/inference_engine.py:21-28``) — one
        preprocessing contract, one jit cache, and the engine's ``dtype``
        knob (``jnp.bfloat16`` for the measured fast path) comes for free."""
        from incremental_multimodal_medical_learning_ii_tpu.models.image_engine import (
            ImageInferenceEngine,
        )

        self.image_engine = ImageInferenceEngine(
            image_params, resize_size=resize_size, crop_size=crop_size,
            dtype=dtype or jnp.float32,
        )
        self.image_params = image_params
        self.text_engine = text_engine
        self.resize_size = resize_size
        self.crop_size = crop_size

    # ------------------------------------------------------------------
    def _load(self, image_path) -> Tuple[np.ndarray, Tuple[int, int]]:
        return self.image_engine.load_and_transform_input_image(image_path)

    def get_similarity_score_from_raw_data(
        self, image_path, query_text: Union[str, List[str]]
    ) -> float:
        query = [query_text] if isinstance(query_text, str) else list(query_text)
        img, _ = self._load(image_path)
        img_emb = np.asarray(
            self.image_engine._global(self.image_params, jnp.asarray(img))
        )[0]
        img_emb = img_emb / max(np.linalg.norm(img_emb), 1e-12)
        txt = self.text_engine.get_embeddings_from_prompt(query, normalize=False)
        txt = txt.mean(axis=0)
        txt = txt / max(np.linalg.norm(txt), 1e-12)
        return float(img_emb @ txt)

    def get_similarity_map_from_raw_data(
        self, image_path, query_text: str, interpolation: str = "nearest"
    ) -> np.ndarray:
        assert isinstance(query_text, str)
        img, (width, height) = self._load(image_path)
        txt = self.text_engine.get_embeddings_from_prompt([query_text], normalize=True)[0]
        return self._map_from(img, (width, height), txt, interpolation)

    def _map_from(self, img, size_wh, txt_norm, interpolation="nearest") -> np.ndarray:
        patches = self.image_engine._patches(self.image_params, jnp.asarray(img))[0]  # (h, w, D)
        sim = jnp.einsum(
            "hwd,d->hw", patches, jnp.asarray(txt_norm),
            precision=jax.lax.Precision.HIGHEST,
        )
        smoothed = np.asarray(gaussian_smooth_2d(sim, sigma=1.5))
        width, height = size_wh
        return convert_similarity_to_image_size(
            smoothed, width, height, self.resize_size, self.crop_size, interpolation
        )

    def get_score_and_map_from_raw_data(
        self, image_path, query_text: str, interpolation: str = "nearest"
    ):
        """(global similarity score, grounding map) with ONE image load /
        preprocess and ONE text encode — the two separate raw-data methods
        each pay those again (and two extra dispatch round-trips on a
        tunneled host)."""
        assert isinstance(query_text, str)
        img, size_wh = self._load(image_path)
        img_emb = np.asarray(
            self.image_engine._global(self.image_params, jnp.asarray(img))
        )[0]
        img_emb = img_emb / max(np.linalg.norm(img_emb), 1e-12)
        txt = self.text_engine.get_embeddings_from_prompt([query_text], normalize=False)[0]
        txt_norm = txt / max(np.linalg.norm(txt), 1e-12)
        score = float(img_emb @ txt_norm)
        return score, self._map_from(img, size_wh, txt_norm, interpolation)


def convert_similarity_to_image_size(
    similarity_map: np.ndarray,
    width: int,
    height: int,
    resize_size: Optional[int],
    crop_size: Optional[int],
    interpolation: str = "nearest",
) -> np.ndarray:
    """Map the patch-grid similarity back onto the original image geometry,
    NaN-padding the region outside the center crop (``vlp:121-155``)."""
    smallest = min(width, height)
    if crop_size is not None:
        if resize_size is not None:
            target = int(crop_size * smallest / resize_size)
        else:
            target = crop_size
        upsized = _interpolate(similarity_map, (target, target), interpolation)
        out = np.full((height, width), np.nan, np.float32)
        margin_w, margin_h = width - target, height - target
        top, left = math.floor(margin_h / 2), math.floor(margin_w / 2)
        # negative margins (target larger than the image side, e.g.
        # crop_size > dim with resize_size=None) reproduce the reference's
        # negative F.pad: CROP floor(|margin|/2) off the near side and
        # ceil(|margin|/2) off the far side, instead of a wrapped slice
        src_top, dst_top = max(0, -top), max(0, top)
        src_left, dst_left = max(0, -left), max(0, left)
        h_span = min(target - src_top, height - dst_top)
        w_span = min(target - src_left, width - dst_left)
        out[dst_top : dst_top + h_span, dst_left : dst_left + w_span] = (
            upsized[src_top : src_top + h_span, src_left : src_left + w_span]
        )
        return out
    return _interpolate(similarity_map, (height, width), interpolation)


def _interpolate(grid: np.ndarray, size: Tuple[int, int], mode: str) -> np.ndarray:
    if mode == "nearest":
        # torch F.interpolate(mode='nearest') convention (the reference,
        # vlp/inference_engine.py:139-144): src = floor(dst * in / out).
        # jax.image.resize's half-pixel-center nearest picks DIFFERENT
        # source pixels at non-integer scales (2.5-14% of pixels measured),
        # so index explicitly.
        h_idx = (np.arange(size[0]) * grid.shape[0] // size[0]).astype(np.intp)
        w_idx = (np.arange(size[1]) * grid.shape[1] // size[1]).astype(np.intp)
        return np.asarray(grid)[np.ix_(h_idx, w_idx)]
    if mode in ("bilinear", "linear"):
        # antialias=False: torch F.interpolate(mode='bilinear') never
        # antialiases, even when the target is SMALLER than the 15x15 patch
        # grid (tiny images); jax's default would widen the filter there
        out = jax.image.resize(
            jnp.asarray(grid), size, method="bilinear", antialias=False
        )
        return np.asarray(out)
    raise ValueError(f"unsupported interpolation {mode!r}")


def plot_phrase_grounding_similarity_map(image_path, similarity_map: np.ndarray):
    """Three-panel figure — input image, isoline overlay, heatmap overlay —
    matching the vendored visualization (``common/visualization.py:36-120``:
    isoline levels at 0.25 steps, RdBu_r in [-1, 1], alpha 0.5)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from incremental_multimodal_medical_learning_ii_tpu.data.images import load_image

    fig, axes = plt.subplots(1, 3, figsize=(15, 6))
    img = load_image(image_path)
    masked = np.ma.masked_invalid(similarity_map)

    axes[0].imshow(img, cmap="gray")
    axes[0].axis("off")
    axes[0].set_title("Input image")

    axes[1].imshow(img, cmap="gray")
    levels = np.linspace(0.25, 1, 4)
    try:
        contours = axes[1].contour(masked, cmap="RdBu_r", vmin=-1, vmax=1, levels=levels)
        axes[1].clabel(contours, inline=True, fontsize=10)
    except ValueError:
        pass  # flat/empty maps have no isolines
    axes[1].axis("off")
    axes[1].set_title("Similarity isolines")

    axes[2].imshow(img, cmap="gray")
    im = axes[2].matshow(masked, alpha=0.5, cmap="RdBu_r", vmin=-1, vmax=1)
    fig.colorbar(im, ax=axes[2])
    axes[2].axis("off")
    axes[2].set_title("Similarity heatmap")
    return fig
