"""Standalone prompt-embedding analysis (reference L5 scripts
``plot_text_emebeddings.py`` and ``text_prompts_cosine_similarity.py``).

Encodes the prompt banks, then writes the 10x10 (or 5x5 pos-only) cosine
heatmap and the PCA / t-SNE projections of the mean prompt embeddings as
PNG files.

    python -m incremental_multimodal_medical_learning_ii_tpu.cli.analyze_prompts \
        --out-dir plots/ [--new-prompts] [--single-prompt] \
        [--cxr-bert-checkpoint ckpt.pt --cxr-bert-vocab vocab.txt]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--single-prompt", action="store_true")
    p.add_argument("--new-prompts", action="store_true")
    p.add_argument("--pos-only", action="store_true", help="5x5 positive-only heatmap")
    p.add_argument(
        "--normalize", action="store_true",
        help="L2-normalise the mean prompt embeddings before projecting "
             "(the standalone reference scripts' variant, "
             "plot_text_emebeddings.py:44-53; the Trainer's plots use raw means)",
    )
    p.add_argument("--seed", type=int, default=27)
    p.add_argument("--cxr-bert-checkpoint")
    p.add_argument("--cxr-bert-vocab")
    p.add_argument(
        "--cxr-bert-num-heads", type=int, default=None,
        help="attention heads for the raw state dict (default: hidden//64 "
        "heuristic — right for real CXR-BERT, wrong for nonstandard dims)",
    )
    p.add_argument(
        "--partition", choices=["tp", "sp", "pp"],
        help="multi-device text encode over all visible devices: tensor- "
             "(heads/FFN), sequence- (ring attention) or pipeline-parallel "
             "(parallel/{tp,sp,pp}.py); default single-device",
    )
    p.add_argument(
        "--partition-size", type=int, default=0,
        help="devices on the model/seq/pipe axis (0 = all visible devices; "
             "the rest become the data axis)",
    )
    args = p.parse_args(argv)

    from incremental_multimodal_medical_learning_ii_tpu.evaluation import plots
    from incremental_multimodal_medical_learning_ii_tpu.ops.cosine import masked_mean
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
    )

    prompts = create_prompts(
        CHEXPERT_COMPETITION_TASKS,
        single_prompt=args.single_prompt,
        new_prompts=args.new_prompts,
        train_logit_diff=not args.pos_only,
        seed=args.seed,
    )
    if args.cxr_bert_checkpoint and args.cxr_bert_vocab:
        from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
            load_cxr_bert_checkpoint,
        )
        from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
            TextInferenceEngine,
        )
        from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
            PromptTokenizer,
        )

        params, dims = load_cxr_bert_checkpoint(
            args.cxr_bert_checkpoint, num_heads=args.cxr_bert_num_heads
        )
        engine_kw = {}
        if args.partition:
            import jax

            from incremental_multimodal_medical_learning_ii_tpu.parallel.pp import (
                create_mesh_pp,
            )
            from incremental_multimodal_medical_learning_ii_tpu.parallel.sp import (
                create_mesh_sp,
            )
            from incremental_multimodal_medical_learning_ii_tpu.parallel.tp import (
                create_mesh_2d,
            )

            n = len(jax.devices())
            size = args.partition_size or n
            if n % size:
                raise SystemExit(
                    f"--partition-size {size} does not divide {n} devices"
                )
            make = {"tp": create_mesh_2d, "sp": create_mesh_sp,
                    "pp": create_mesh_pp}[args.partition]
            engine_kw = {"mesh": make(n // size, size),
                         "partition": args.partition}
        encode = TextInferenceEngine(
            params, dims, PromptTokenizer(args.cxr_bert_vocab), **engine_kw
        ).encode_fn(normalize=False)
        emb_dim = dims.projection_size  # 128 for real CXR-BERT; honors
        # nonstandard checkpoints instead of failing the bank's shape check
    else:
        if args.partition:
            raise SystemExit("--partition needs --cxr-bert-checkpoint "
                             "(the synthetic encoder has no device program)")
        print("[warn] no CXR-BERT checkpoint; synthetic prompt encoder")
        encode = synthetic_encode_fn(seed=args.seed)
        emb_dim = 128

    bank = build_prompt_bank(
        encode, prompts, CHEXPERT_COMPETITION_TASKS,
        train_logit_diff=not args.pos_only, emb_dim=emb_dim,
    )
    pos = np.asarray(masked_mean(bank.pos, bank.pos_count))
    neg = np.asarray(masked_mean(bank.neg, bank.neg_count))
    if args.normalize:
        pos = pos / np.maximum(np.linalg.norm(pos, axis=1, keepdims=True), 1e-12)
        neg = neg / np.maximum(np.linalg.norm(neg, axis=1, keepdims=True), 1e-12)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    fig = plots.prompt_cosine_heatmap_figure(
        pos, None if args.pos_only else neg, args.single_prompt
    )
    fig.savefig(out / "cosine_similarity_heat_map.png", dpi=150)
    # --pos-only: the 'negatives' are mirrored positives (bank.py mirrors
    # them when train_logit_diff is off); plotting them would fabricate 5
    # duplicate 'Negative' markers that were never encoded
    pca_fig, tsne_fig = plots.prompt_projection_figures(
        pos, None if args.pos_only else neg, seed=args.seed
    )
    pca_fig.savefig(out / "pca_multiple_prompts.png", dpi=150)
    tsne_fig.savefig(out / "tsne_multiple_prompts.png", dpi=150)
    print(f"wrote 3 figures to {out}")


if __name__ == "__main__":
    main()
