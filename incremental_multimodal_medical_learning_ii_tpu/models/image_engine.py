"""Single-image inference engine.

Capability parity with ``health_multimodal/image/inference_engine.py``:
load one CXR from disk (JPEG/PNG/DICOM/NIfTI with percentile remap), apply
the resize/center-crop pipeline, and return

* :meth:`get_projected_global_embedding` — L2-normalised (128,) embedding
  (``inference_engine.py:69-87``; note the *extraction* pass stores raw,
  un-normalised embeddings — that path lives in engine/extract.py);
* :meth:`get_projected_patch_embeddings` — (h, w, 128) L2-normalised patch
  grid + the original (width, height) (``:59-67``).

Default geometry matches the vendored factory: resize 512, crop 480
(``image/utils.py:11-12``); the repo's own extraction pipeline uses
512/512 (``DataRetrieval.py:175-180``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
    biovil_image_forward,
    get_patchwise_projected_embeddings,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import preprocess_host

TRANSFORM_RESIZE = 512
TRANSFORM_CENTER_CROP_SIZE = 480


class ImageInferenceEngine:
    def __init__(
        self,
        params,
        resize_size: int = TRANSFORM_RESIZE,
        crop_size: int = TRANSFORM_CENTER_CROP_SIZE,
        dtype=jnp.float32,
    ):
        self.params = params
        self.resize_size = resize_size
        self.crop_size = crop_size
        self._global = jax.jit(
            lambda p, img: biovil_image_forward(p, img, dtype=dtype).projected_global_embedding
        )
        self._patches = jax.jit(
            lambda p, img: get_patchwise_projected_embeddings(p, img, normalize=True, dtype=dtype)
        )

    def load_and_transform_input_image(self, image_path) -> Tuple[np.ndarray, Tuple[int, int]]:
        from incremental_multimodal_medical_learning_ii_tpu.data.images import load_image

        raw = load_image(image_path)
        pre = preprocess_host(raw, size=self.resize_size, crop=self.crop_size)
        return pre[None], (raw.shape[1], raw.shape[0])  # (width, height)

    def get_projected_global_embedding(self, image_path) -> np.ndarray:
        img, _ = self.load_and_transform_input_image(image_path)
        emb = np.asarray(self._global(self.params, jnp.asarray(img)))[0]
        return emb / max(np.linalg.norm(emb), 1e-12)

    def get_projected_patch_embeddings(self, image_path) -> Tuple[np.ndarray, Tuple[int, int]]:
        img, size = self.load_and_transform_input_image(image_path)
        patches = np.asarray(self._patches(self.params, jnp.asarray(img)))[0]
        return patches, size
