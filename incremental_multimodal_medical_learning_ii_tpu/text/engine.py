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
        self, params, dims: BertDims, tokenizer: PromptTokenizer, dtype=None,
        mesh=None, partition: str = "tp", n_microbatches: int = 1,
    ):
        """``dtype=jnp.bfloat16`` opts the BERT layer stack into the bf16
        fast path (parity default is fp32, as on the image side).

        ``mesh`` opts the projected-embedding path into a multi-device
        program; ``partition`` picks the sharding: ``"tp"`` (heads/FFN over
        a ``model`` axis, parallel/tp.py), ``"sp"`` (sequence over a
        ``seq`` axis via ring attention, parallel/sp.py — for report-length
        inputs) or ``"pp"`` (layer stack over a ``pipe`` axis,
        parallel/pp.py, with ``n_microbatches``).  Inputs are padded to the
        mesh's divisibility requirements automatically and padding is
        stripped from the output; the mask-/ring-/pipeline-level padding
        semantics are the tested ones of the underlying modules.  MLM fill
        and raw ``bert_encode`` stay single-device (tiny workloads).
        """
        dtype = dtype or jnp.float32
        self.params = params
        self.dims = dims
        self.tokenizer = tokenizer
        # enforce the model's hard position cap, but never RAISE a tighter
        # budget the caller configured on the tokenizer (the reference keeps
        # this cap on the engine, inference_engine.py:43-46 — mutating the
        # shared tokenizer upward would silently accept over-long prompts)
        tokenizer.max_allowed_input_length = min(
            tokenizer.max_allowed_input_length, dims.max_position_embeddings
        )
        self._embed = jax.jit(
            lambda p, ids, mask, normalize: get_projected_text_embeddings(
                p, ids, mask, dims, normalize=normalize, dtype=dtype
            ),
            static_argnames=("normalize",),
        )
        self._encode = jax.jit(
            lambda p, ids, mask: bert_encode(p, ids, mask, dims, dtype=dtype)
        )
        self._mesh = mesh
        self._partition = partition
        self._n_microbatches = n_microbatches
        self._dtype = dtype
        self._parallel_fns = {}  # normalize -> jitted encode
        if mesh is not None:
            if partition not in ("tp", "sp", "pp"):
                raise ValueError(f"unknown partition {partition!r}")
            if partition == "tp":
                from incremental_multimodal_medical_learning_ii_tpu.parallel.tp import (
                    shard_bert_tp,
                )

                self.params = shard_bert_tp(params, mesh, dims)

    def _parallel_embed_fn(self, normalize: bool):
        fn = self._parallel_fns.get(normalize)
        if fn is None:
            from incremental_multimodal_medical_learning_ii_tpu.parallel import (
                pp, sp, tp,
            )

            if self._partition == "tp":
                fn = tp.make_tp_text_encode(
                    self.dims, self._mesh, normalize=normalize, dtype=self._dtype
                )
            elif self._partition == "sp":
                fn = sp.make_sp_text_encode(
                    self.dims, self._mesh, normalize=normalize, dtype=self._dtype
                )
            else:
                fn = pp.make_pp_text_encode(
                    self.dims, self._mesh, self._n_microbatches,
                    normalize=normalize, dtype=self._dtype,
                )
            self._parallel_fns[normalize] = fn
        return fn

    def _parallel_embed(self, ids, mask, normalize: bool) -> np.ndarray:
        from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import (
            DATA_AXIS,
        )

        n = ids.shape[0]
        axes = dict(self._mesh.shape)
        if self._partition == "sp":
            from incremental_multimodal_medical_learning_ii_tpu.parallel.sp import (
                SEQ_AXIS,
                pad_tokens_for_sp,
            )

            ids, mask = pad_tokens_for_sp(ids, mask, axes[SEQ_AXIS])
        # batch divisibility: data axis, times microbatch count for pp
        b_mult = axes.get(DATA_AXIS, 1)
        if self._partition == "pp":
            b_mult *= self._n_microbatches
        n_pad = ((n + b_mult - 1) // b_mult) * b_mult
        if n_pad != n:
            # dummy rows (mask all-zero) ride the modules' tested padding
            # semantics and are stripped below
            ids = np.concatenate([ids, np.zeros((n_pad - n, ids.shape[1]), ids.dtype)])
            mask = np.concatenate([mask, np.zeros((n_pad - n, mask.shape[1]), mask.dtype)])
        fn = self._parallel_embed_fn(normalize)
        out = fn(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out)[:n]

    def get_embeddings_from_prompt(
        self, prompts: TypePrompts, normalize: bool = True
    ) -> np.ndarray:
        ids, mask = self.tokenizer.tokenize_prompts(prompts)
        if self._mesh is not None:
            return self._parallel_embed(ids, mask, normalize)
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
