"""Zero-shot / joint-train-bound driver (reference ``ZERO_JOINT_BOUNDS.py``).

Defaults equal the reference's constants (``ZERO_JOINT_BOUNDS.py:16-31``):
bs 6144, lr 1e-4, 10 epochs, multiple prompts, chex competition, all views,
BCEWithLogits.  ``--epochs 0`` gives the zero-shot bound (requires no-head
or shared, as in ``Trainer.py:294-303``).

    python -m incremental_multimodal_medical_learning_ii_tpu.cli.zero_joint_bounds \
        --synthetic --epochs 2 --batch-size 512
"""

from __future__ import annotations

import argparse

from incremental_multimodal_medical_learning_ii_tpu.cli import common
from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import run_zero_joint
from incremental_multimodal_medical_learning_ii_tpu.utils.config import ExperimentConfig


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--folder-name", default="zero-and-joint")
    args = p.parse_args(argv)
    common.enable_compile_cache()

    kw = common.config_kwargs(args)
    if args.epochs == 0 and not args.shared:
        kw.update(adapter="no-head", image_adapter=False, text_adapter=False)
    cfg = ExperimentConfig(mode="joint" if args.epochs > 0 else "zero",
                           folder_name=args.folder_name, **kw)
    print("run:", cfg.run_name())
    bundle = common.load_bundle(args)
    bank = common.build_bank(args, cfg)
    results = run_zero_joint(cfg, bundle, bank, log_dir=args.log_dir,
                             mesh=common.make_mesh(args), trace_dir=args.trace_dir)
    common.print_results(results)


if __name__ == "__main__":
    main()
