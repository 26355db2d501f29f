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
                   help="train every lr x seed block of a (optim, adapter, "
                   "prompt-mode) group as ONE vmapped dispatch (lr is a "
                   "dynamic optax hyperparam and seeds stack their init/"
                   "shuffle streams; engine/sweep.py) — K x E dispatches "
                   "collapse to one per group.  Results equal the "
                   "sequential path (tests/test_sweep_vmap.py)")
    p.add_argument("--seeds", type=int, nargs="+", default=None,
                   help="extra grid axis over adapter-init/shuffle seeds "
                   "(error bars over training randomness).  The prompt "
                   "bank stays built from --seed so the task itself is "
                   "fixed across the axis")
    args = p.parse_args(argv)
    common.enable_compile_cache()

    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import ExperimentConfig
    from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import maybe_trace

    bundle = common.load_bundle(args)
    base = common.config_kwargs(args)
    base.pop("lr"), base.pop("optim"), base.pop("adapter"), base.pop("prompt_mode")
    base.pop("plot_figures")  # the sweep always runs figure-free (below)
    bank_seed = base.pop("seed")  # prompts/bank pinned to --seed (see --seeds)
    seeds = args.seeds or [bank_seed]

    results = []
    t0 = time.perf_counter()
    # bank cache keyed on the prompt set it encodes (single_prompt changes
    # the prompt LIST, so 'single' vs 'mean'/'max' grid points must not
    # share a bank); building per config would re-encode the prompts
    # through CXR-BERT once per grid point
    banks: dict = {}

    def bank_of(cfg):
        # built at --seed regardless of the swept config seed: the bank IS
        # the task (prompt sampling + synthetic encoder); --seeds varies the
        # training randomness, not the problem
        if cfg.single_prompt not in banks:
            import dataclasses

            banks[cfg.single_prompt] = common.build_bank(
                args, dataclasses.replace(cfg, seed=bank_seed)
            )
        return banks[cfg.single_prompt]

    def report(auroc, lr, optim, adapter, pm, seed):
        results.append((float(auroc), lr, optim, adapter, pm, seed))
        tag = f" seed={seed}" if len(seeds) > 1 else ""
        print(f"lr={lr:<8} opt={optim:<5} adapter={adapter:<6} prompts={pm:<5}"
              f"{tag} val-AUROC-macro={auroc:.4f}")

    def grid_cfgs(optim, adapter, pm):
        return [
            ExperimentConfig(
                mode="joint", lr=lr, optim=optim, adapter=adapter,
                prompt_mode=pm, plot_figures="off", seed=seed, **base,
            )
            for seed in seeds for lr in args.lrs
        ]

    def sequential(optim, adapter, pm):
        for cfg in grid_cfgs(optim, adapter, pm):
            trainer = Trainer(cfg, bank_of(cfg))
            for epoch in range(1, cfg.epochs + 1):
                trainer.train(bundle.train, epoch)
            report(trainer.quick_auroc(bundle.val).mean(), cfg.lr, optim,
                   adapter, pm, cfg.seed)

    with maybe_trace(args.trace_dir):  # one trace spanning the whole grid
        for optim, adapter, pm in itertools.product(
            args.optims, args.adapters, args.prompt_modes
        ):
            if not args.vmap:
                sequential(optim, adapter, pm)
                continue
            from incremental_multimodal_medical_learning_ii_tpu.engine.sweep import (
                run_vmapped_sweep,
            )

            cfgs = grid_cfgs(optim, adapter, pm)
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
                sequential(optim, adapter, pm)
                continue
            for cfg, vec in zip(cfgs, aurocs):
                report(vec.mean(), cfg.lr, optim, adapter, pm, cfg.seed)
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
    seed_tag = f" seed={best[5]}" if len(seeds) > 1 else ""
    print(f"best: AUROC {best[0]:.4f} @ lr={best[1]} opt={best[2]} "
          f"adapter={best[3]} prompts={best[4]}{seed_tag}")


if __name__ == "__main__":
    main()
