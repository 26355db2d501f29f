"""``--vmap`` sweep == the sequential sweep, config for config.

``engine/sweep.py::run_vmapped_sweep`` trains every learning rate of one
(optim, adapter, prompt-mode) group as ONE vmapped dispatch over stacked
TrainStates (lr rides in the opt state as a dynamic optax hyperparam).
These tests pin that the batched path reproduces the sequential Trainer
loop — same per-epoch permutation stream, same fused-epoch math, same
quick_auroc scoring — and that non-vmappable point sets are rejected with
a ValueError (the CLI then falls back loudly).
"""

import dataclasses

import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.data.store import (
    synthetic_dataset,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.sweep import (
    run_vmapped_sweep,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import (
    create_prompts,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
    ExperimentConfig,
)


def _bank():
    return build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS, train_logit_diff=True,
    )


@pytest.mark.slow
def test_vmap_sweep_equals_sequential_eight_configs():
    """4 learning rates x {adam, sgd} = 8 grid points: each vmapped group's
    per-class AUROCs must equal the sequential Trainer loop's (shuffled
    epochs — the vmapped path must consume the same fold_in(epoch) stream a
    fresh Trainer does)."""
    train = synthetic_dataset(300, seed=1)
    val = synthetic_dataset(150, seed=2)
    bank = _bank()
    lrs = [1e-4, 3e-4, 1e-3, 3e-3]
    for optim in ("adam", "sgd"):
        cfgs = [
            ExperimentConfig(mode="joint", lr=lr, optim=optim, epochs=2,
                             batch_size=64, eval_batch_size=64,
                             plot_figures="off")
            for lr in lrs
        ]
        vm = run_vmapped_sweep(cfgs, train, val, bank)
        assert vm.shape == (len(lrs), 5)
        for cfg, vec in zip(cfgs, vm):
            t = Trainer(cfg, bank)
            for e in range(1, cfg.epochs + 1):
                t.train(train, e)
            seq = np.asarray(t.quick_auroc(val))
            # batched (vmapped) dots may reassociate fp sums vs the single
            # config's — measured <=1e-6 here and <=2e-4 at CLI scale
            # (8192 rows, 3 epochs, lrs up to 0.3; oneDNN order-dependent)
            np.testing.assert_allclose(vec, seq, rtol=0, atol=1e-5,
                                       err_msg=f"{optim} lr={cfg.lr}")


@pytest.mark.slow
def test_vmap_sweep_seed_axis_equals_sequential():
    """Seeds stack their OWN init params and epoch-permutation streams
    (in_axes=0 perms): each (lr, seed) point must match a fresh sequential
    Trainer at that seed."""
    train = synthetic_dataset(260, seed=1)
    val = synthetic_dataset(130, seed=2)
    bank = _bank()
    # lrs capped at 3e-3 like the test above: at 1e-2 the K-stacked batched
    # dots' fp reassociation (~8e-5 on params) flips AUROC ranks near ties
    # (measured 5.8e-4 on one class; K=1 vmapped matches sequential exactly)
    pts = [(lr, seed) for seed in (27, 99) for lr in (1e-3, 3e-3)]
    cfgs = [
        ExperimentConfig(mode="joint", lr=lr, seed=seed, epochs=2,
                         batch_size=64, eval_batch_size=64,
                         plot_figures="off")
        for lr, seed in pts
    ]
    vm = run_vmapped_sweep(cfgs, train, val, bank)
    # the two seeds' trajectories must actually differ (a shared-perm bug
    # would make them equal at equal lr)
    assert not np.allclose(vm[0], vm[2], atol=1e-4)
    for cfg, vec in zip(cfgs, vm):
        t = Trainer(cfg, bank)
        for e in range(1, cfg.epochs + 1):
            t.train(train, e)
        np.testing.assert_allclose(
            vec, np.asarray(t.quick_auroc(val)), rtol=0, atol=1e-5,
            err_msg=f"lr={cfg.lr} seed={cfg.seed}",
        )


def test_vmap_sweep_rejects_mixed_programs():
    """Points differing in anything but lr need different executables; the
    helper must refuse (the CLI groups by those knobs and falls back loudly
    on anything else)."""
    train = synthetic_dataset(100, seed=1)
    val = synthetic_dataset(100, seed=2)
    base = ExperimentConfig(mode="joint", lr=1e-3, epochs=1, batch_size=64,
                            eval_batch_size=64, plot_figures="off")
    mixed = [base, dataclasses.replace(base, lr=1e-4, optim="sgd")]
    with pytest.raises(ValueError, match="differ only in lr/seed"):
        run_vmapped_sweep(mixed, train, val, _bank())
    sched = [dataclasses.replace(base, lr_schedule="exponential")]
    with pytest.raises(ValueError, match="constant lr"):
        run_vmapped_sweep(sched, train, val, _bank())
