"""End-to-end CheXpert classifier for serving.

The deployable artifact of the whole stack: raw CXR images -> fused
preprocess -> frozen BioViL ResNet-50 -> (optional) trained image adapter ->
prompt-cosine scores against the HBM-cached (optionally text-adapted)
prompt bank.  Equivalent to running the reference's extraction +
``Trainer.test`` scoring path on new images, packaged as one jitted
function with static batching.

No reference counterpart exists (the reference has no inference/serving
entry point); semantics follow ``Trainer.py:1016-1047`` (scores, argmax
predictions).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.models.adapters import AdapterPair
from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
    biovil_image_forward,
)
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import (
    PromptBank,
    apply_text_adapter_to_bank,
    score_embeddings,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
    DevicePreprocessPlan,
    preprocess_device_indexed,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
    ExperimentConfig,
    PromptMode,
)


class ChexpertClassifier:
    """Batched raw-image -> 5-way score/prediction service."""

    def __init__(
        self,
        image_params,
        bank: PromptBank,
        cfg: Optional[ExperimentConfig] = None,
        adapter_params=None,
        batch_size: int = 16,
        size: int = 512,
        crop: Optional[int] = None,
        pad_to: int = 1024,
        dtype=jnp.bfloat16,
        retries: int = 2,
        retry_backoff_s: float = 0.25,
    ):
        self.retries = retries
        self.retry_backoff_s = retry_backoff_s
        if cfg is None and adapter_params:
            # a no-head default would never APPLY the given adapters,
            # silently serving zero-shot scores
            raise ValueError(
                "adapter_params given without a cfg enabling an adapter — "
                "pass the ExperimentConfig the adapters were trained under"
            )
        self.cfg = cfg or ExperimentConfig(
            adapter="no-head", image_adapter=False, text_adapter=False, epochs=0, mode="zero"
        )
        self.pair = AdapterPair(
            kind=self.cfg.adapter,
            shared=self.cfg.shared,
            use_image=self.cfg.image_adapter,
            use_text=self.cfg.text_adapter,
        )
        self.adapter_params = adapter_params or {}
        self.bank = bank
        self.batch_size = batch_size
        self.plan = DevicePreprocessPlan(size=size, crop=crop, pad_to=pad_to)
        self.class_names = list(CHEXPERT_COMPETITION_TASKS)

        cfg_ = self.cfg

        def fn(img_p, ad_p, raw, w_h, w_w, idx, bank_):
            # single-channel images + folded conv1 — exact math, 1/3 the
            # image HBM footprint (models/biovil_image.py::fold_grayscale_conv1).
            # Indexed (deduped) resize matrices: the dense per-image pairs
            # are ~4 MB/image — 30x the raw pixels — which murders an
            # upload-bandwidth-bound link (same change engine/extract.py
            # made; U is power-of-two bucketed so recompiles stay bounded)
            images = preprocess_device_indexed(raw, w_h, w_w, idx, channels=1)
            embs = biovil_image_forward(img_p, images, dtype=dtype).projected_global_embedding
            x = self.pair.apply_image(ad_p, embs)
            b = (
                apply_text_adapter_to_bank(self.pair.apply_text, ad_p, bank_)
                if self.pair.use_text
                else bank_
            )
            out = score_embeddings(
                x, b, cfg_.prompt_mode, cfg_.train_logit_diff, cfg_.pred_logit_diff
            )
            return out.scores, out.preds

        from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
            fold_grayscale_conv1,
        )

        self._fn = jax.jit(fn)
        self.image_params = fold_grayscale_conv1(image_params)

    def predict_arrays(self, images: Sequence[np.ndarray]):
        """images: list of (H, W) uint8 -> (scores (N, 5), preds (N, 5))."""
        scores_all: List[np.ndarray] = []
        preds_all: List[np.ndarray] = []
        if not images:
            n_cls = len(self.class_names)
            # same dtypes as the non-empty path (float32 {0.,1.} preds)
            return np.empty((0, n_cls), np.float32), np.empty((0, n_cls), np.float32)
        for start in range(0, len(images), self.batch_size):
            chunk = list(images[start : start + self.batch_size])
            n = len(chunk)
            while len(chunk) < self.batch_size:  # static shapes
                chunk.append(chunk[-1])
            raw, w_h, w_w, idx = self.plan.prepare_deduped(chunk)
            scores_np, preds_np = self._dispatch_with_retry(raw, w_h, w_w, idx)
            scores_all.append(scores_np[:n])
            preds_all.append(preds_np[:n])
        return np.concatenate(scores_all), np.concatenate(preds_all)

    def _dispatch_with_retry(self, raw, w_h, w_w, idx):
        """One jitted dispatch + readback, re-dispatched on transient
        backend errors (utils/retry.py — the same policy as extraction:
        a serving request must survive a tunnel hiccup)."""
        from incremental_multimodal_medical_learning_ii_tpu.utils.retry import (
            retry_call,
        )

        def attempt():
            scores, preds = self._fn(
                self.image_params, self.adapter_params, raw, w_h, w_w, idx, self.bank
            )
            return np.asarray(scores), np.asarray(preds)

        return retry_call(attempt, self.retries, self.retry_backoff_s)

    def predict_paths(self, paths: Sequence[str]):
        from incremental_multimodal_medical_learning_ii_tpu.data.images import (
            load_image_raw_uint8,
        )

        return self.predict_arrays([load_image_raw_uint8(p) for p in paths])
