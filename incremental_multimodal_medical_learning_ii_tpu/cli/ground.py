"""Phrase grounding: image + text query -> similarity score + overlay map.

CLI surface over the VLP engine (``vlp/engine.py``, parity with the
vendored ``ImageTextInferenceEngine``,
``health_multimodal/vlp/inference_engine.py:30-155`` and the overlay plot
``common/visualization.py:109-120``; the reference itself exposes this
only as a library).

    python -m incremental_multimodal_medical_learning_ii_tpu.cli.ground \
        --image cxr.jpg --query "left pleural effusion" \
        --biovil-checkpoint biovil.pt \
        --cxr-bert-snapshot /weights/BiomedVLP-CXR-BERT-specialized \
        --out overlay.png
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--query", required=True, help="free-text phrase to ground")
    p.add_argument("--biovil-checkpoint")
    p.add_argument("--biovil-npz", help="torch-free bundle (cli.convert_weights)")
    p.add_argument("--random-weights", action="store_true",
                   help="random BioViL + synthetic text encoder (smoke/demo)")
    p.add_argument("--cxr-bert-snapshot")
    p.add_argument("--cxr-bert-checkpoint")
    p.add_argument("--cxr-bert-vocab")
    p.add_argument("--resize", type=int, default=512)
    p.add_argument("--crop", type=int, default=480,
                   help="default geometry matches the vendored engine factory")
    p.add_argument("--out", help="write the 3-panel overlay figure here")
    p.add_argument("--save-map", help="write the raw similarity map (npy)")
    args = p.parse_args(argv)

    from incremental_multimodal_medical_learning_ii_tpu.cli.common import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from incremental_multimodal_medical_learning_ii_tpu.cli.common import (
        load_image_tower,
    )

    image_params = load_image_tower(args)

    # text tower
    if args.cxr_bert_snapshot:
        from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
            load_cxr_bert_snapshot,
        )
        from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
            TextInferenceEngine,
        )

        bert, dims, tokenizer = load_cxr_bert_snapshot(args.cxr_bert_snapshot)
        if tokenizer is None:
            raise SystemExit("snapshot has no vocab.txt; pass --cxr-bert-vocab")
        text_engine = TextInferenceEngine(bert, dims, tokenizer)
    elif args.cxr_bert_checkpoint and args.cxr_bert_vocab:
        from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
            load_cxr_bert_checkpoint,
        )
        from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
            TextInferenceEngine,
        )
        from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
            PromptTokenizer,
        )

        bert, dims = load_cxr_bert_checkpoint(args.cxr_bert_checkpoint)
        text_engine = TextInferenceEngine(
            bert, dims, PromptTokenizer(args.cxr_bert_vocab)
        )
    elif args.random_weights:
        from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
            synthetic_encode_fn,
        )

        class _SyntheticText:
            def __init__(self):
                self._fn = synthetic_encode_fn()

            def get_embeddings_from_prompt(self, prompts, normalize=True):
                import numpy as np

                embs = self._fn(list(prompts))
                if normalize:
                    embs = embs / np.maximum(
                        np.linalg.norm(embs, axis=-1, keepdims=True), 1e-12
                    )
                return embs

        text_engine = _SyntheticText()
    else:
        raise SystemExit("give --cxr-bert-snapshot or --cxr-bert-checkpoint + vocab")

    from incremental_multimodal_medical_learning_ii_tpu.vlp.engine import (
        ImageTextInferenceEngine,
        plot_phrase_grounding_similarity_map,
    )

    engine = ImageTextInferenceEngine(
        image_params, text_engine, resize_size=args.resize, crop_size=args.crop
    )
    score, sim_map = engine.get_score_and_map_from_raw_data(args.image, args.query)
    print(f"similarity score: {score:.4f}")
    print(f"map: shape={sim_map.shape} max={float(__import__('numpy').nanmax(sim_map)):.4f}")

    if args.save_map:
        import numpy as np

        np.save(args.save_map, sim_map)
        print(f"wrote {args.save_map}")
    if args.out:
        fig = plot_phrase_grounding_similarity_map(args.image, sim_map)
        fig.savefig(args.out, bbox_inches="tight")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
