"""Shared CLI plumbing: dataset loading, prompt-bank construction, mesh.

The reference's drivers hard-code every hyperparameter in ``__main__``
blocks and persist configuration only in the run-dir name; these CLIs take
argparse flags whose *defaults equal the reference's constants*, and a
``--synthetic`` mode substitutes learnable fake data for smoke runs (the
CheXpert data and BioViL weights are not redistributable).
"""

from __future__ import annotations

import argparse
from pathlib import Path
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.data.store import (
    EmbeddingDataset,
    synthetic_dataset,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import DataBundle
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import PromptBank
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
    ExperimentConfig,
)


def enable_compile_cache() -> None:
    from incremental_multimodal_medical_learning_ii_tpu.utils.compile_cache import enable

    enable()


def load_image_tower(args):
    """BioViL image params from the CLI's weight-source flags, in precedence
    order: --biovil-npz (torch-free bundle) > --biovil-checkpoint (torch
    state dict) > --random-weights (smoke/demo).  Shared by classify/serve
    and ground so a new weight-source lands everywhere at once."""
    if getattr(args, "biovil_npz", None):
        from incremental_multimodal_medical_learning_ii_tpu.utils.serialization import (
            load_params_npz,
        )

        params, _ = load_params_npz(args.biovil_npz)
        return params
    if getattr(args, "biovil_checkpoint", None):
        from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
            load_biovil_image_checkpoint,
        )

        return load_biovil_image_checkpoint(args.biovil_checkpoint)
    if getattr(args, "random_weights", False):
        import jax

        from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
            init_biovil_image_model,
        )

        print("[warn] --random-weights: scores are meaningless")
        return init_biovil_image_model(jax.random.PRNGKey(0))
    raise SystemExit(
        "--biovil-checkpoint or --biovil-npz required (or --random-weights)"
    )


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--batch-size", type=int, default=6144)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--seed", type=int, default=27)
    p.add_argument("--single-prompt", action="store_true")
    p.add_argument("--new-prompts", action="store_true")
    p.add_argument("--max-emb", action="store_true", help="MAX over prompt ensemble")
    p.add_argument("--adapter", choices=["mlp", "dense", "no-head"], default="mlp")
    p.add_argument("--optim", choices=["adam", "sgd"], default="adam")
    p.add_argument("--shared", action="store_true")
    p.add_argument("--no-image-adapter", action="store_true")
    p.add_argument("--no-text-adapter", action="store_true")
    p.add_argument("--train-logit-pos", action="store_true", help="train on pos only")
    p.add_argument("--pred-logit-diff", action="store_true")
    p.add_argument("--change-labels", action="store_true")
    p.add_argument("--xrays-position", choices=["all", "frontal"], default="all")
    p.add_argument(
        "--no-shuffle", action="store_true",
        help="deterministic epoch order (the reference's DataLoaders reshuffle "
        "every epoch, Trainer.py:238-246; turning that off makes whole runs "
        "bit-reproducible)",
    )
    p.add_argument(
        "--fused-unit", action="store_true",
        help="fuse each incremental unit's epochs (a data-inc part / "
        "class-inc task) PLUS its post-unit val/test evals into ONE "
        "dispatched XLA program — one device round-trip per unit instead "
        "of per epoch + per eval (engine/steps.py::build_fused_unit). "
        "Joint mode fuses the WHOLE run with its per-epoch evals "
        "(eval_mode='per_epoch') unless --plot-figures reference needs "
        "live params between epochs.",
    )
    p.add_argument("--log-dir", default="runs")
    p.add_argument("--data-dir", help="dir with train/val/test .npz (or reference .pt) embedding datasets")
    p.add_argument("--synthetic", action="store_true", help="learnable fake data (smoke runs)")
    p.add_argument("--cxr-bert-checkpoint", help="torch state-dict path for CXR-BERT")
    p.add_argument("--cxr-bert-vocab", help="vocab.txt for the CXR-BERT tokenizer")
    p.add_argument(
        "--cxr-bert-num-heads", type=int, default=None,
        help="attention heads for --cxr-bert-checkpoint (a raw state dict "
        "does not record them; default infers hidden//64, right for real "
        "CXR-BERT but silently wrong for nonstandard checkpoints — prefer "
        "--cxr-bert-snapshot, whose config.json is authoritative)",
    )
    p.add_argument(
        "--cxr-bert-snapshot",
        help="local HF snapshot dir (config.json + weights + vocab.txt), as "
        "materialised by the hub download of microsoft/BiomedVLP-CXR-BERT-specialized",
    )
    p.add_argument("--mesh-devices", type=int, default=0, help="0 = all devices")
    p.add_argument("--tsne-plots", action="store_true", help="enable t-SNE figure hooks")
    p.add_argument(
        "--plot-figures", choices=["reference", "final", "off"],
        default="reference",
        help="TB figure cadence: 'reference' draws every figure every "
        "epoch/task like the reference's Trainer (matplotlib per epoch is "
        "the reference's real behavior but pure host cost); 'final' only "
        "at the last epoch/task; 'off' skips figures. 'final'/'off' also "
        "let --fused-unit fuse a joint run's epochs + evals into one "
        "program (figures would otherwise need live params mid-run).",
    )
    p.add_argument(
        "--trace-dir",
        help="capture a jax.profiler device trace of the training/eval loop "
        "into this directory (viewable in TensorBoard / Perfetto / XProf); "
        "train epochs and eval passes carry named spans",
    )


def prompt_mode_of(args) -> str:
    if args.single_prompt:
        return "single"
    return "max" if args.max_emb else "mean"


def config_kwargs(args) -> dict:
    return dict(
        batch_size=args.batch_size,
        lr=args.lr,
        epochs=args.epochs,
        seed=args.seed,
        prompt_mode=prompt_mode_of(args),
        new_prompts=args.new_prompts,
        adapter=args.adapter,
        optim=args.optim,
        shared=args.shared,
        image_adapter=not args.no_image_adapter,
        text_adapter=not args.no_text_adapter,
        train_logit_diff=not args.train_logit_pos,
        pred_logit_diff=args.pred_logit_diff,
        change_labels=args.change_labels,
        xrays_position=args.xrays_position,
        shuffle_train=not args.no_shuffle,
        fused_unit=args.fused_unit,
        plot_figures=args.plot_figures,
    )


def _load_split(data_dir: Path, split: str) -> EmbeddingDataset:
    npz = data_dir / f"{split}.npz"
    if npz.exists():
        return EmbeddingDataset.load(npz)
    pt = data_dir / f"{split}.pt"
    if pt.exists():
        return EmbeddingDataset.load_torch_pt(pt)
    raise FileNotFoundError(f"no {split}.npz or {split}.pt in {data_dir}")


def load_bundle(args) -> DataBundle:
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        dirs = rng.normal(size=(5, 128)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        bundle = DataBundle(
            train=synthetic_dataset(8192, seed=1, class_directions=dirs),
            val=synthetic_dataset(2048, seed=2, class_directions=dirs),
            test=synthetic_dataset(2048, seed=3, class_directions=dirs),
        )
    else:
        if not args.data_dir:
            raise SystemExit("--data-dir required (or use --synthetic)")
        d = Path(args.data_dir)
        bundle = DataBundle(
            train=_load_split(d, "train"),
            val=_load_split(d, "val"),
            test=_load_split(d, "test"),
        )
    return bundle.with_tsne_subsets() if args.tsne_plots else bundle


def build_bank(args, cfg: ExperimentConfig) -> PromptBank:
    prompts = create_prompts(
        CHEXPERT_COMPETITION_TASKS,
        single_prompt=cfg.single_prompt,
        new_prompts=cfg.new_prompts,
        train_logit_diff=cfg.train_logit_diff,
        seed=cfg.seed,
    )
    if getattr(args, "cxr_bert_snapshot", None):
        from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
            load_cxr_bert_snapshot,
        )
        from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
            TextInferenceEngine,
        )

        params, dims, tokenizer = load_cxr_bert_snapshot(args.cxr_bert_snapshot)
        if tokenizer is None:
            raise SystemExit(f"{args.cxr_bert_snapshot} has no vocab.txt")
        engine = TextInferenceEngine(params, dims, tokenizer)
        encode = engine.encode_fn(normalize=False)
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

        params, dims = load_cxr_bert_checkpoint(
            args.cxr_bert_checkpoint,
            num_heads=getattr(args, "cxr_bert_num_heads", None),
        )
        engine = TextInferenceEngine(params, dims, PromptTokenizer(args.cxr_bert_vocab))
        encode = engine.encode_fn(normalize=False)
    elif args.cxr_bert_checkpoint or args.cxr_bert_vocab:
        # a half-specified pair must NOT silently fall back to the synthetic
        # encoder: a full run would complete exit-0 against a random bank
        missing = "--cxr-bert-vocab" if args.cxr_bert_checkpoint else "--cxr-bert-checkpoint"
        raise SystemExit(
            f"--cxr-bert-checkpoint and --cxr-bert-vocab go together; "
            f"{missing} is missing (or pass --cxr-bert-snapshot instead)"
        )
    else:
        print("[warn] no CXR-BERT checkpoint given; using synthetic prompt encoder")
        encode = synthetic_encode_fn(seed=cfg.seed)
        dims = None
    if dims is not None and dims.projection_size != 128:
        # the bank must live in the image tower's 128-d joint space
        # (JOINT_FEATURE_SIZE; BioViL projector output) — a text checkpoint
        # with another projection size cannot score 128-d image embeddings
        raise SystemExit(
            f"text checkpoint projects to {dims.projection_size}-d but the "
            f"joint space is 128-d; this checkpoint is not a BioViL-paired "
            f"CXR-BERT"
        )
    return build_prompt_bank(
        encode, prompts, CHEXPERT_COMPETITION_TASKS, train_logit_diff=cfg.train_logit_diff
    )


def make_mesh(args):
    if args.mesh_devices == 1:
        return None
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import create_mesh

    n = args.mesh_devices or len(jax.devices())
    return create_mesh(n) if n > 1 else None


def print_results(results) -> None:
    for key, metrics in results.items():
        if isinstance(metrics, dict):
            line = ", ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"{key}: {line}")
