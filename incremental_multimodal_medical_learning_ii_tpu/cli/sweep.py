"""Hyperparameter sweep over the adapter-training configuration.

Enabled by the TPU-first engine: one fused-epoch scan per epoch and
on-device AUROC make a full 10-epoch joint training a ~0.5s affair, so a
grid over lr x optimizer x adapter x prompt-mode runs in about a minute —
something the reference (hours per run) could never do.

    python -m incremental_multimodal_medical_learning_ii_tpu.cli.sweep \
        --synthetic --epochs 5 --batch-size 2048
"""

from __future__ import annotations

import argparse
import itertools
import time


def main(argv=None) -> None:
    from incremental_multimodal_medical_learning_ii_tpu.cli import common

    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--lrs", type=float, nargs="+", default=[1e-4, 1e-3, 1e-2])
    p.add_argument("--optims", nargs="+", default=["adam", "sgd"])
    p.add_argument("--adapters", nargs="+", default=["mlp", "dense"])
    p.add_argument("--prompt-modes", nargs="+", default=["mean", "max"])
    p.add_argument("--vmap", action="store_true",
                   help="train every learning rate of a (optim, adapter, "
                   "prompt-mode) group as ONE vmapped dispatch (lr is a "
                   "dynamic optax hyperparam, so the group shares one "
                   "executable; engine/sweep.py) — K x E dispatches "
                   "collapse to one per group.  Results equal the "
                   "sequential path (tests/test_sweep_vmap.py)")
    args = p.parse_args(argv)
    common.enable_compile_cache()

    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import ExperimentConfig
    from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import maybe_trace

    bundle = common.load_bundle(args)
    base = common.config_kwargs(args)
    base.pop("lr"), base.pop("optim"), base.pop("adapter"), base.pop("prompt_mode")
    base.pop("plot_figures")  # the sweep always runs figure-free (below)

    results = []
    t0 = time.perf_counter()
    # bank cache keyed on the prompt set it encodes (single_prompt changes
    # the prompt LIST, so 'single' vs 'mean'/'max' grid points must not
    # share a bank); building per config would re-encode the prompts
    # through CXR-BERT once per grid point
    banks: dict = {}

    def bank_of(cfg):
        if cfg.single_prompt not in banks:
            banks[cfg.single_prompt] = common.build_bank(args, cfg)
        return banks[cfg.single_prompt]

    def report(auroc, lr, optim, adapter, pm):
        results.append((float(auroc), lr, optim, adapter, pm))
        print(f"lr={lr:<8} opt={optim:<5} adapter={adapter:<6} prompts={pm:<5} "
              f"val-AUROC-macro={auroc:.4f}")

    def sequential(lrs, optim, adapter, pm):
        for lr in lrs:
            cfg = ExperimentConfig(
                mode="joint", lr=lr, optim=optim, adapter=adapter,
                prompt_mode=pm, plot_figures="off", **base,
            )
            trainer = Trainer(cfg, bank_of(cfg))
            for epoch in range(1, cfg.epochs + 1):
                trainer.train(bundle.train, epoch)
            report(trainer.quick_auroc(bundle.val).mean(), lr, optim, adapter, pm)

    with maybe_trace(args.trace_dir):  # one trace spanning the whole grid
        for optim, adapter, pm in itertools.product(
            args.optims, args.adapters, args.prompt_modes
        ):
            if not args.vmap:
                sequential(args.lrs, optim, adapter, pm)
                continue
            from incremental_multimodal_medical_learning_ii_tpu.engine.sweep import (
                run_vmapped_sweep,
            )

            cfgs = [
                ExperimentConfig(
                    mode="joint", lr=lr, optim=optim, adapter=adapter,
                    prompt_mode=pm, plot_figures="off", **base,
                )
                for lr in args.lrs
            ]
            try:
                aurocs = run_vmapped_sweep(
                    cfgs, bundle.train, bundle.val, bank_of(cfgs[0])
                )
            except ValueError as e:
                # non-vmappable knob (lr schedule, no trainable adapter):
                # fall back LOUDLY so the dispatch count is never silently
                # K x E when the user asked for 1
                print(f"[warn] --vmap unavailable for opt={optim} "
                      f"adapter={adapter} prompts={pm} ({e}); running "
                      f"sequentially")
                sequential(args.lrs, optim, adapter, pm)
                continue
            for lr, vec in zip(args.lrs, aurocs):
                report(vec.mean(), lr, optim, adapter, pm)
    import math

    # quick_auroc is NaN for a class with single-polarity labels; NaN
    # compares False everywhere so a plain sort could print it as "best"
    ranked = [r for r in results if not math.isnan(r[0])]
    dropped = len(results) - len(ranked)
    if dropped:
        print(f"[warn] {dropped} config(s) had undefined AUROC "
              f"(a val class with one polarity) and were excluded from ranking")
    ranked.sort(reverse=True)
    print(f"\n{len(results)} configs in {time.perf_counter() - t0:.1f}s")
    if not ranked:
        raise SystemExit("every config's AUROC was undefined on this val split")
    best = ranked[0]
    print(f"best: AUROC {best[0]:.4f} @ lr={best[1]} opt={best[2]} "
          f"adapter={best[3]} prompts={best[4]}")


if __name__ == "__main__":
    main()
