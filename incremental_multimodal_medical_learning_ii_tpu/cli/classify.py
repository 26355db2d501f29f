"""Serve/classify CLI: raw CXR images -> per-class scores and predictions.

    python -m incremental_multimodal_medical_learning_ii_tpu.cli.classify \
        --biovil-checkpoint biovil.pt \
        --cxr-bert-checkpoint cxr_bert.pt --cxr-bert-vocab vocab.txt \
        [--adapter-checkpoint run_dir] img1.jpg img2.jpg ...

The classifier-construction half (``add_classifier_args`` /
``build_classifier``) is shared with the HTTP server (``cli/serve.py``).
"""

from __future__ import annotations

import argparse


def add_classifier_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--biovil-checkpoint",
                   help="biovil_image_resnet50_proj_size_128.pt")
    p.add_argument("--biovil-npz",
                   help="torch-free converted bundle (cli.convert_weights); "
                   "loads without torch installed")
    p.add_argument("--random-weights", action="store_true",
                   help="randomly initialised BioViL (smoke runs/demos; scores meaningless)")
    p.add_argument("--cxr-bert-checkpoint")
    p.add_argument("--cxr-bert-vocab")
    p.add_argument("--cxr-bert-snapshot",
                   help="local HF snapshot dir (config.json + weights + "
                   "vocab.txt), same as the training CLIs")
    p.add_argument("--seed", type=int, default=27,
                   help="prompt seed — must match the served adapter's "
                   "training seed when --new-prompts samples the bank")
    p.add_argument("--adapter-checkpoint", help="run dir with a saved TrainState")
    p.add_argument("--reference-image-adapter",
                   help="a reference image_adapter.pt (pickled torch module)")
    p.add_argument("--reference-text-adapter",
                   help="a reference text_adapter.pt (pickled torch module)")
    p.add_argument("--adapter", choices=["mlp", "dense"], default="mlp",
                   help="adapter architecture of --adapter-checkpoint")
    p.add_argument("--optim", choices=["adam", "sgd"], default="adam",
                   help="optimizer the --adapter-checkpoint was trained "
                   "with (the saved TrainState carries its opt-state tree; "
                   "a mismatched template cannot restore)")
    p.add_argument("--shared", action="store_true")
    p.add_argument("--no-image-adapter", action="store_true",
                   help="--adapter-checkpoint was trained with only a text "
                   "adapter (the restore template must match its tree)")
    p.add_argument("--no-text-adapter", action="store_true",
                   help="--adapter-checkpoint was trained with only an "
                   "image adapter")
    p.add_argument("--train-logit-pos", action="store_true",
                   help="the served adapter was trained with the pos-only "
                   "logit (TRAIN_LOGIT_DIFF=False): build the bank with "
                   "mirrored negatives exactly as training did")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--pad-to", type=int, default=1024)
    p.add_argument("--new-prompts", action="store_true")
    p.add_argument("--single-prompt", action="store_true")
    p.add_argument("--max-emb", action="store_true", dest="max_emb",
                   help="MAX prompt-ensemble reduction — must match how the "
                   "served adapter was TRAINED (the reference headline joint "
                   "run uses MAX; default is MEAN)")
    p.add_argument("--bank", help="a saved prompt bank .npz (skips CXR-BERT entirely)")
    p.add_argument("--save-bank", help="save the built prompt bank here")


def build_classifier(args):
    """Construct the jitted ChexpertClassifier from parsed CLI args."""
    from incremental_multimodal_medical_learning_ii_tpu.inference import ChexpertClassifier

    from incremental_multimodal_medical_learning_ii_tpu.cli.common import (
        build_bank,
        load_image_tower,
    )

    image_params = load_image_tower(args)

    if args.bank:
        from incremental_multimodal_medical_learning_ii_tpu.text.bank import load_prompt_bank

        bank = load_prompt_bank(args.bank)
    else:
        # the one bank builder the training CLIs use (common.build_bank):
        # same snapshot/checkpoint loading, same prompt seed semantics — a
        # served adapter must score against the bank it trained under
        import types

        bank = build_bank(args, types.SimpleNamespace(
            single_prompt=args.single_prompt,
            new_prompts=args.new_prompts,
            train_logit_diff=not args.train_logit_pos,
            seed=args.seed,
        ))
    if args.save_bank:
        from incremental_multimodal_medical_learning_ii_tpu.text.bank import save_prompt_bank

        save_prompt_bank(args.save_bank, bank)
        print(f"saved prompt bank -> {args.save_bank}")

    cfg = None
    adapter_params = None
    if args.max_emb and not (args.reference_image_adapter
                             or args.reference_text_adapter
                             or args.adapter_checkpoint):
        # zero-shot serving with MAX prompt reduction
        from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
            ExperimentConfig,
        )

        cfg = ExperimentConfig(
            adapter="no-head", image_adapter=False, text_adapter=False,
            epochs=0, mode="zero", prompt_mode="max",
        )
    if args.reference_image_adapter or args.reference_text_adapter:
        from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
            load_reference_adapter,
        )
        from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
            joint_config,
        )

        adapter_params = {}
        if args.reference_image_adapter:
            adapter_params["image"] = load_reference_adapter(args.reference_image_adapter)
        if args.reference_text_adapter:
            adapter_params["text"] = load_reference_adapter(args.reference_text_adapter)
        kind = "mlp" if "dense2" in next(iter(adapter_params.values())) else "dense"
        cfg = joint_config(
            adapter=kind,
            image_adapter="image" in adapter_params,
            text_adapter="text" in adapter_params,
            prompt_mode="max" if args.max_emb else "mean",
        )
    elif args.adapter_checkpoint:
        from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import (
            restore_checkpoint,
        )
        from incremental_multimodal_medical_learning_ii_tpu.engine.steps import (
            init_train_state,
        )
        from incremental_multimodal_medical_learning_ii_tpu.models.adapters import (
            AdapterPair,
        )
        from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
            joint_config,
        )

        import jax

        cfg = joint_config(adapter=args.adapter, shared=args.shared,
                           optim=args.optim,
                           image_adapter=not args.no_image_adapter,
                           text_adapter=not args.no_text_adapter,
                           prompt_mode="max" if args.max_emb else "mean")
        pair = AdapterPair(cfg.adapter, cfg.shared, cfg.image_adapter, cfg.text_adapter)
        template, _ = init_train_state(pair, pair.init(jax.random.PRNGKey(0)), cfg)
        try:
            adapter_params = restore_checkpoint(args.adapter_checkpoint, template).params
        except Exception as first_err:
            # opt-state tree mismatch: retry with the other optimizer's
            # template (only .params is used for serving).  If the retry
            # also fails the checkpoint is genuinely missing/corrupt — the
            # ORIGINAL error is the one that describes it, so chain it
            # instead of surfacing a confusing second template mismatch.
            import dataclasses

            other = "sgd" if args.optim == "adam" else "adam"
            alt_cfg = dataclasses.replace(cfg, optim=other)
            alt_template, _ = init_train_state(pair, pair.init(jax.random.PRNGKey(0)), alt_cfg)
            try:
                adapter_params = restore_checkpoint(args.adapter_checkpoint, alt_template).params
            except Exception:
                raise first_err from None
            print(f"[info] checkpoint restored with an {other} opt-state "
                  f"template (pass --optim {other} to silence this)")

    return ChexpertClassifier(
        image_params, bank, cfg=cfg, adapter_params=adapter_params,
        batch_size=args.batch_size, size=args.size, pad_to=args.pad_to,
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("images", nargs="+")
    add_classifier_args(p)
    args = p.parse_args(argv)

    clf = build_classifier(args)
    scores, preds = clf.predict_paths(args.images)
    header = "image," + ",".join(c.replace(" ", "_") for c in clf.class_names)
    print(header)
    for path, row in zip(args.images, scores):
        print(path + "," + ",".join(f"{v:.4f}" for v in row))


if __name__ == "__main__":
    main()
