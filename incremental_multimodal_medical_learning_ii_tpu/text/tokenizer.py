"""Prompt tokenization with the reference's input conventions.

Reference behavior (``health_multimodal/text/data/io.py:17-58`` +
``text/inference_engine.py:37-48``):

* a single string is promoted to a one-element list;
* prompts must not contain special tokens (``[MASK]`` is allowed);
* trailing ``!?.`` punctuation is stripped;
* batch-encoded with ``padding='longest'`` and special tokens added;
* sequences longer than the model's ``max_position_embeddings`` raise.

The WordPiece tokenizer itself is ``transformers.BertTokenizer`` over a
*local* vocab file (the CXR-BERT vocab when available; tests use a
synthetic vocab) — no network access is required or attempted.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Tuple, Union

import numpy as np

TypePrompts = Union[str, List[str]]


class PromptTokenizer:
    def __init__(self, vocab_file: str | Path, max_allowed_input_length: int = 512,
                 **tokenizer_kwargs):
        """``tokenizer_kwargs`` pass through to ``BertTokenizer`` (e.g.
        ``do_lower_case``/``strip_accents`` from a snapshot's
        tokenizer_config.json — the reference's ``from_pretrained`` honors
        that file, so ignoring it would silently tokenize differently)."""
        from transformers import BertTokenizer

        self.tokenizer = BertTokenizer(vocab_file=str(vocab_file), **tokenizer_kwargs)
        self.max_allowed_input_length = max_allowed_input_length

    @property
    def mask_token_id(self) -> int:
        return self.tokenizer.mask_token_id

    def assert_special_tokens_not_present(self, prompt: str) -> None:
        special = list(self.tokenizer.all_special_tokens)
        special.remove(self.tokenizer.mask_token)  # [MASK] is allowed
        if any(tok in prompt for tok in special):
            raise ValueError(
                f'The input "{prompt}" contains at least one special token ({special})'
            )

    def tokenize_prompts(self, prompts: TypePrompts) -> Tuple[np.ndarray, np.ndarray]:
        """-> (input_ids, attention_mask) int32 arrays, padded to the longest
        prompt in the batch."""
        prompts = [prompts] if isinstance(prompts, str) else list(prompts)
        self.assert_special_tokens_not_present(" ".join(prompts))
        prompts = [p.rstrip("!?.") for p in prompts]
        out = self.tokenizer.batch_encode_plus(
            batch_text_or_text_pairs=prompts,
            add_special_tokens=True,
            padding="longest",
            return_tensors="np",
        )
        ids = out["input_ids"].astype(np.int32)
        mask = out["attention_mask"].astype(np.int32)
        if ids.shape[1] > self.max_allowed_input_length:
            raise ValueError(
                f"The sequence length of the input ({ids.shape[1]}) is longer than "
                f"the maximum allowed sequence length ({self.max_allowed_input_length})."
            )
        return ids, mask

    def convert_ids_to_tokens(self, ids: Sequence[int]) -> List[str]:
        return self.tokenizer.convert_ids_to_tokens(list(ids))


def write_test_vocab(path: str | Path, extra_words: Sequence[str] = ()) -> Path:
    """Synthetic WordPiece vocab covering the CheXpert prompt banks; for
    tests/CI where the CXR-BERT vocab is unavailable."""
    from incremental_multimodal_medical_learning_ii_tpu.text import prompts as prompt_mod
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
    )

    words = set()
    bank = prompt_mod.template_prompts(CHEXPERT_COMPETITION_TASKS)
    comp = prompt_mod.compositional_prompts(seed=0)
    single = prompt_mod.basic_prompts(CHEXPERT_COMPETITION_TASKS)
    for b in (bank, comp, single):
        for entry in b.values():
            for plist in entry.values():
                for p in plist:
                    words.update(p.lower().replace(",", " ").replace(".", " ").split())
    words.update(w.lower() for w in extra_words)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + sorted(words)
    path = Path(path)
    path.write_text("\n".join(vocab) + "\n")
    return path
