"""Reproduce the reference's headline table (BASELINE.md) in one command.

Each BASELINE.md row maps to one gate with the reference's exact
hyperparameters (hard-coded in the reference's driver ``__main__`` blocks;
cited per gate below):

* ``zero-shot``  — frozen BioViL, mean multi-prompt, no head
                   -> test AUROC-macro 0.6702   (ZERO_JOINT_BOUNDS.py, epochs=0)
* ``joint``      — MAX-prompt, mlp double adapter, Adam lr 1e-3, bs 6144,
                   10 epochs -> best test AUROC-macro 0.8721
                   (ZERO_JOINT_BOUNDS.py:16-31)
* ``class-inc``  — class-pos-neg, SGD lr 0.1, SHARED mlp, mean prompt,
                   5 tasks x 10 epochs -> per-task test AUROC-macro
                   0.8045, 0.8418, 0.8469, 0.8072, 0.7264 (forgetting)
                   (CLASS_INCREMENTAL.py:32-57)

Usage (the moment CheXpert embedding datasets + CXR-BERT weights exist):

    python -m incremental_multimodal_medical_learning_ii_tpu.cli.reproduce \
        --data-dir /data/embeddings \
        --cxr-bert-snapshot /weights/BiomedVLP-CXR-BERT-specialized \
        [--gates zero-shot joint class-inc] [--tolerance 0.02]

``--data-dir`` must hold ``{train,val,test}.npz`` or the reference's
``{train,val,test}.pt`` TensorDatasets (Trainer.py:221-235 layout).
Exit code is non-zero if any gate misses its target by more than
``--tolerance``.

``--dry-run`` substitutes tiny learnable synthetic data and a synthetic
prompt encoder and skips the assertions — it proves the whole pipeline is
runnable end-to-end today, so the parity gate is executable the day real
data/weights appear.
"""

from __future__ import annotations

import argparse
import sys

# (gate, metric description, reference value) — BASELINE.md rows
TARGETS = {
    "zero-shot": ("test AUROC-macro", 0.6702),
    "joint": ("best test AUROC-macro", 0.8721),
    "class-inc": ("task-5 test AUROC-macro", 0.7264),
}
CLASS_INC_CURVE = [0.8045, 0.8418, 0.8469, 0.8072, 0.7264]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    from incremental_multimodal_medical_learning_ii_tpu.cli import common

    common.add_common_args(p)
    p.add_argument("--gates", nargs="+", default=["zero-shot", "joint", "class-inc"],
                   choices=list(TARGETS))
    p.add_argument("--tolerance", type=float, default=0.02,
                   help="max |AUROC - reference| per gate")
    p.add_argument("--dry-run", action="store_true",
                   help="tiny synthetic data, no assertions (plumbing smoke)")
    p.add_argument("--rehearsal", action="store_true",
                   help="reference-scale synthetic data (191,027 train rows, "
                   "the real batch/epoch counts) with assertions disabled: "
                   "times each gate at deployment scale so the parity gate's "
                   "cost is known before real data/weights arrive; wall time "
                   "per gate is printed and belongs in docs/RUNBOOK.md")
    args = p.parse_args(argv)
    common.enable_compile_cache()

    # every gate hard-codes the reference's hyperparameters by design —
    # warn loudly if the user tried to override one of them so a pass/fail
    # is never attributed to settings that were silently ignored
    defaults = {
        "batch_size": 6144, "lr": 1e-4, "epochs": 10, "adapter": "mlp",
        "optim": "adam", "single_prompt": False, "max_emb": False,
        "shared": False, "train_logit_pos": False, "pred_logit_diff": False,
        "new_prompts": False, "change_labels": False, "xrays_position": "all",
        "no_image_adapter": False, "no_text_adapter": False, "no_shuffle": False,
        "plot_figures": "reference",
    }  # --seed is NOT pinned: gate configs and the rehearsal RNG honor it;
    # --fused-unit is honored too (class-inc unit fusion; under it the joint
    # gate folds its whole run and moves figures to the final epoch)
    ignored = [k for k, v in defaults.items() if getattr(args, k) != v]
    if ignored:
        print(f"[warn] reproduce pins the reference's hyperparameters; "
              f"ignoring overridden flag(s): {', '.join(ignored)}")

    from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
        run_class_incremental,
        run_zero_joint,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        ExperimentConfig,
    )

    if args.dry_run or args.rehearsal:
        args.synthetic = True
    if args.rehearsal:
        # reference data scale: the Trainer loads the FULL 191,027-row
        # frontal train dataset (Trainer.py:221-235; splitTrainingEmbedding
        # prints that length) — the 175k/16,027 head/tail artifacts it also
        # writes are not on the training path; 16,027 stands in for the
        # val split's order of magnitude
        import numpy as np

        from incremental_multimodal_medical_learning_ii_tpu.data.store import (
            synthetic_dataset,
        )
        from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
            DataBundle,
        )

        rng = np.random.default_rng(args.seed)
        dirs = rng.normal(size=(5, 128)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        bundle = DataBundle(
            train=synthetic_dataset(191_027, seed=1, class_directions=dirs),
            val=synthetic_dataset(16_027, seed=2, class_directions=dirs),
            test=synthetic_dataset(2_048, seed=3, class_directions=dirs),
        )
    else:
        bundle = common.load_bundle(args)
    if args.dry_run:  # tiny slices: the point is plumbing, not AUROC
        import dataclasses

        bundle = dataclasses.replace(
            bundle,
            train=bundle.train.subset(range(1024)),
            val=bundle.val.subset(range(256)),
            test=bundle.test.subset(range(256)),
        )

    _bank_cache: list = []

    def bank_for(cfg):
        # all three gates use identical prompt banks (same prompt set, seed,
        # and train_logit_diff); with a real CXR-BERT snapshot, rebuilding
        # would re-load the weights and re-run the BERT prompt encode per
        # gate — build once and reuse.
        if not _bank_cache:
            _bank_cache.append(common.build_bank(args, cfg))
        return _bank_cache[0]

    mesh = common.make_mesh(args)
    epochs = 1 if args.dry_run else 10
    batch = 512 if args.dry_run else 6144
    failures = []
    import time as _time

    gate_t0 = [None]

    def gate_start():
        gate_t0[0] = _time.perf_counter()

    def check(gate, measured, target):
        delta = measured - target
        wall = _time.perf_counter() - gate_t0[0]
        line = (
            f"{gate}: {TARGETS[gate][0]} = {measured:.4f} "
            f"(reference {target:.4f}, delta {delta:+.4f})  [wall {wall:.1f}s]"
        )
        print(line)
        if not (args.dry_run or args.rehearsal) and abs(delta) > args.tolerance:
            failures.append(line)

    if "zero-shot" in args.gates:
        # zero-shot: no head, mean multi-prompt (BASELINE.md row 1)
        gate_start()
        cfg = ExperimentConfig(
            mode="zero", epochs=0, adapter="no-head",
            image_adapter=False, text_adapter=False,
            eval_batch_size=1024, seed=args.seed,
        )
        res = run_zero_joint(cfg, bundle, bank_for(cfg), log_dir=args.log_dir,
                             mesh=mesh, trace_dir=args.trace_dir)
        check("zero-shot", res["test_zero"]["auroc_macro"], TARGETS["zero-shot"][1])

    if "joint" in args.gates:
        # joint upper bound: MAX prompt, mlp double, adam lr 1e-3 (row 5)
        gate_start()
        cfg = ExperimentConfig(
            mode="joint", epochs=epochs, batch_size=batch, lr=1e-3,
            optim="adam", adapter="mlp", prompt_mode="max", seed=args.seed,
            # honored: under --fused-unit the WHOLE joint run (all epochs +
            # per-epoch val/test) is ONE dispatch.  The fold stages each
            # epoch's own TrainState so even "reference"-cadence figures
            # would be exact; final-only is kept as a SPEED choice (the gate
            # checks AUROC scalars, and ~10 matplotlib figures per epoch
            # are host-bound minutes on a 1-vCPU box)
            fused_unit=args.fused_unit,
            plot_figures="final" if args.fused_unit else "reference",
        )
        res = run_zero_joint(cfg, bundle, bank_for(cfg), log_dir=args.log_dir,
                             mesh=mesh, trace_dir=args.trace_dir)
        best = max(
            res[f"test_ep{e}"]["auroc_macro"] for e in range(1, cfg.epochs + 1)
        )
        check("joint", best, TARGETS["joint"][1])

    if "class-inc" in args.gates:
        # forgetting curve: class-pos-neg, SGD lr 0.1, SHARED mlp (row 8).
        # more_labels stays False: the reference encodes MORE_LABELS in both
        # the folder ("-more-labels") and run name ("-MORE-LABELS",
        # Trainer.py:preprocessing_class_incremental) and the headline run's
        # name carries neither — the committed driver's MORE_LABELS=True
        # (CLASS_INCREMENTAL.py:55) postdates that recorded run.
        gate_start()
        cfg = ExperimentConfig(
            mode="class-pos-neg", epochs=epochs, batch_size=batch, lr=0.1,
            optim="sgd", adapter="mlp", shared=True, seed=args.seed,
            # honored (not pinned): same math, one dispatch per task instead
            # of per epoch — lets --rehearsal A/B the unit-fusion wall time
            fused_unit=args.fused_unit,
        )
        res = run_class_incremental(
            cfg, bundle, bank_for(cfg), log_dir=args.log_dir, mesh=mesh,
            trace_dir=args.trace_dir,
        )
        curve = [res[f"test_task{t}"]["auroc_macro"] for t in range(1, 6)]
        print("class-inc curve:", " ".join(f"{v:.4f}" for v in curve),
              "(reference", " ".join(f"{v:.4f}" for v in CLASS_INC_CURVE) + ")")
        check("class-inc", curve[-1], TARGETS["class-inc"][1])

    if args.dry_run:
        print("dry-run OK: all selected gates executed end-to-end")
        return
    if args.rehearsal:
        print("rehearsal OK: all selected gates executed at reference scale "
              "(synthetic data; parity assertions skipped)")
        return
    if failures:
        print("\nPARITY GATE FAILED:")
        for line in failures:
            print(" ", line)
        sys.exit(1)
    print("\nPARITY GATE PASSED (tolerance", args.tolerance, ")")


if __name__ == "__main__":
    main()
