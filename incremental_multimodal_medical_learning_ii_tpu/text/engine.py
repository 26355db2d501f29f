"""Text inference engine: CXR-BERT on device behind the tokenizer.

Capability parity with the vendored ``TextInferenceEngine``
(``health_multimodal/text/inference_engine.py``):

* :meth:`get_embeddings_from_prompt` — projected [CLS] embeddings for a list
  of prompts (optionally L2-normalised);
* :meth:`get_pairwise_similarities` — diagonal cosine similarities between
  two prompt sets (``:72-82``);
* :meth:`predict_masked_tokens` — top-1 MLM fill of ``[MASK]`` positions
  (``:84-119``).

TPU notes: prompts are padded to the bank's longest sequence and encoded in
one jitted forward; repeated calls with the same padded length hit the jit
cache.  This engine exists for API completeness and the one-off prompt-bank
build — the training path never calls it per batch (see text/bank.py).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    BertDims,
    bert_encode,
    get_projected_text_embeddings,
    mlm_logits,
)
from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
    PromptTokenizer,
    TypePrompts,
)


class TextInferenceEngine:
    def __init__(
        self, params, dims: BertDims, tokenizer: PromptTokenizer, dtype=None
    ):
        """``dtype=jnp.bfloat16`` opts the BERT layer stack into the bf16
        fast path (parity default is fp32, as on the image side)."""
        dtype = dtype or jnp.float32
        self.params = params
        self.dims = dims
        self.tokenizer = tokenizer
        tokenizer.max_allowed_input_length = dims.max_position_embeddings
        self._embed = jax.jit(
            lambda p, ids, mask, normalize: get_projected_text_embeddings(
                p, ids, mask, dims, normalize=normalize, dtype=dtype
            ),
            static_argnames=("normalize",),
        )
        self._encode = jax.jit(
            lambda p, ids, mask: bert_encode(p, ids, mask, dims, dtype=dtype)
        )

    def get_embeddings_from_prompt(
        self, prompts: TypePrompts, normalize: bool = True
    ) -> np.ndarray:
        ids, mask = self.tokenizer.tokenize_prompts(prompts)
        out = self._embed(self.params, jnp.asarray(ids), jnp.asarray(mask), normalize)
        return np.asarray(out)

    def encode_fn(self, normalize: bool = False):
        """An ``EncodeFn`` for :func:`text.bank.build_prompt_bank`."""

        def encode(texts: List[str]) -> np.ndarray:
            return self.get_embeddings_from_prompt(texts, normalize=normalize)

        return encode

    def get_pairwise_similarities(
        self, prompt_set_1: TypePrompts, prompt_set_2: TypePrompts
    ) -> np.ndarray:
        e1 = self.get_embeddings_from_prompt(prompt_set_1, normalize=True)
        e2 = self.get_embeddings_from_prompt(prompt_set_2, normalize=True)
        # torch.diag(e1 @ e2.T) semantics (inference_engine.py:72-82):
        # min(N1, N2) diagonal entries — broadcasting would raise for
        # unequal sizes and silently over-return for N1 == 1
        n = min(len(e1), len(e2))
        return np.sum(e1[:n] * e2[:n], axis=-1)

    def predict_masked_tokens(self, prompts: TypePrompts) -> List[List[str]]:
        ids, mask = self.tokenizer.tokenize_prompts(prompts)
        hidden = self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask))
        logits = np.asarray(mlm_logits(self.params, hidden))
        predicted = logits.argmax(axis=-1)
        out: List[List[str]] = []
        for b in range(ids.shape[0]):
            mask_positions = ids[b] == self.tokenizer.mask_token_id
            out.append(self.tokenizer.convert_ids_to_tokens(predicted[b, mask_positions]))
        return out
