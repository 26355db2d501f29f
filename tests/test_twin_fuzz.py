"""Randomized twin-run FUZZING: sampled configs from the full knob space.

The hand-written twins (tests/test_twin_run.py) each pin one
regime x knob interaction.  This fuzzer samples the space BETWEEN them:
every valid combination of regime (joint / data-inc / class-inc), adapter
wiring (double / shared / only-image / only-text), adapter kind, optimizer,
prompt mode (single / mean / max), logit knobs (TRAIN_LOGIT_DIFF,
PRED_LOGIT_DIFF, CHANGE_LABELS), NEW_PROMPTS, continual learning
(none / myCL / profCL with sampled threshold/adder/scheduling), shuffled
vs deterministic loaders, task order permutations, MORE_LABELS, batch and
eval-batch sizes, and both engine paths (fused lax.scan vs per-batch) —
executed in lockstep against the reference's OWN Trainer.py and asserted
to the same tolerances as the enumerated twins.  An interaction bug in a
combination nobody thought to enumerate gets sampling pressure here.

Each seed is one reproducible draw: a failure prints the sampled config
dict; re-run `TWIN_FUZZ_SEEDS=<seed> pytest tests/test_twin_fuzz.py` to
reproduce, or set TWIN_FUZZ_SEEDS="1,2,3,..." for a soak sweep.

Validity predicates mirror the reference's own constraints:

* ``SHARED`` force-overrides both adapter flags (Trainer.py:134-137), so
  shared excludes only-X wiring; at least one adapter must exist (the
  reference builds its optimizer over adapter params, Trainer.py:172-186).
* single-prompt mode uses ``basic_create_prompts`` and is never combined
  with MAX (``bert_forward_mean`` asserts the multi-prompt shape,
  Trainer.py:1664-1674) or NEW_PROMPTS in any reference driver.
* NEW_PROMPTS with ``train_logit_diff=False`` returns a positives-only
  bank (new_texts_prompts.py:98-131 ``ONLY_POS``) that no driver runs;
  the fuzzer pins NEW_PROMPTS to diff-logit training like
  ZERO_JOINT_BOUNDS.py does.
* MORE_LABELS is class-incremental only (CLASS_INCREMENTAL.py:77-85);
  joint training has no CL hooks (ZERO_JOINT_BOUNDS.py has no
  myCL/profCL plumbing).
* SGD runs at lr 0.1 and Adam at 1e-4 — the drivers' operating points
  (CLASS_INCREMENTAL.py:40, DATA_INCREMENTAL.py:52).
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_twin import (  # noqa: E402
    CLASS_NAMES,
    assert_stream_match,
    configure_reference,
    contiguous_parts,
    label_parts,
    load_reference_trainer_module,
    max_param_diff,
    patched_protocols,
    recover_loader_order,
    run_reference_class_incremental,
    run_reference_data_incremental,
    run_reference_joint,
)

from incremental_multimodal_medical_learning_ii_tpu.data.store import (  # noqa: E402
    EmbeddingDataset,
)
from incremental_multimodal_medical_learning_ii_tpu.engine import protocols  # noqa: E402
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (  # noqa: E402
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (  # noqa: E402
    ExperimentConfig,
)

pytestmark = pytest.mark.slow

N_TRAIN, N_VAL, N_TEST = 200, 160, 176

LOSS_ATOL = 5e-6
METRIC_ATOL = 1e-3
PARAM_ATOL = 1e-5
METRIC_TAGS = [
    f"{vt}/{m}"
    for vt in ("val", "test")
    for m in ("Accuracy", "F1-macro score", "F1-weighted score",
              "AUROC-macro", "AUROC-weighted")
]

_env_seeds = os.environ.get("TWIN_FUZZ_SEEDS")
FUZZ_SEEDS = (
    [int(s) for s in _env_seeds.split(",") if s.strip()]
    if _env_seeds
    # 303 draws the joint whole-run fold (unshuffled); 15 draws it shuffled
    # (double adapter, Adam, 2 epochs) — the injected-permutation fold path
    else [15, 101, 202, 303, 404]
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)

    def block(n):
        x = rng.normal(size=(n, 128)).astype(np.float32)
        y = (rng.random((n, 5)) < 0.4).astype(np.float32)
        return x, y

    tx, ty = block(N_TRAIN)
    vx, vy = block(N_VAL)
    sx, sy = block(N_TEST)
    for y in (vy, sy):
        assert (y.sum(0) > 0).all() and (y.sum(0) < len(y)).all()
    return {"train_x": tx, "train_y": ty, "val_x": vx, "val_y": vy,
            "test_x": sx, "test_y": sy}


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_trainer_module()


# ----------------------------------------------------------------------
# Sampler
# ----------------------------------------------------------------------
def sample_config(seed: int) -> dict:
    rng = random.Random(seed)
    c: dict = {"seed": seed}
    c["regime"] = rng.choice(["joint", "data-inc", "class-inc"])
    c["wiring"] = rng.choice(["double", "shared", "only-image", "only-text"])
    c["adapter"] = rng.choice(["mlp", "dense"])
    c["optim"] = rng.choice(["adam", "sgd"])
    c["lr"] = 0.1 if c["optim"] == "sgd" else 1e-4
    if rng.random() < 0.2:
        c["prompt_mode"] = "single"
        c["new_prompts"] = False
    else:
        c["prompt_mode"] = rng.choice(["mean", "max"])
        c["new_prompts"] = rng.random() < 0.15
    c["train_logit_diff"] = True if c["new_prompts"] else rng.random() < 0.8
    c["pred_logit_diff"] = rng.random() < 0.3
    c["change_labels"] = rng.random() < 0.2
    c["batch_size"] = rng.choice([32, 64, 96])
    c["eval_batch_size"] = rng.choice([48, 64])
    c["fused"] = rng.random() < 0.5
    c["shuffle_seed"] = rng.randrange(1, 10_000) if rng.random() < 0.5 else None
    if c["regime"] == "joint":
        c["epochs"] = rng.choice([1, 2, 3])
        c["continual"] = None  # ZERO_JOINT_BOUNDS has no CL hooks
    elif c["regime"] == "data-inc":
        c["parts"] = rng.choice([2, 3])
        c["epochs"] = rng.choice([1, 2])
        c["continual"] = rng.choice([None, "myCL", "profCL"])
    else:
        c["mode"] = rng.choice(["class-pos", "class-pos-neg"])
        c["epochs"] = rng.choice([1, 2])
        c["more_labels"] = rng.random() < 0.3
        c["tasks_order"] = (tuple(rng.sample(range(5), 5))
                            if rng.random() < 0.3 else None)
        c["continual"] = rng.choice([None, "myCL", "profCL"])
    if c["continual"] is not None:
        c["threshold"] = round(rng.uniform(0.004, 0.02), 6)
        c["adder"] = round(rng.uniform(0.0, 0.002), 6)
        c["threshold_scheduling"] = rng.random() < 0.5
    # drawn LAST so adding this knob kept every earlier field's draw stable
    # for a given seed.  For incremental regimes this fuses each unit (all
    # E epochs + the folded post-unit evals in one dispatch); for joint it
    # fuses the WHOLE run (train_joint_run: E epochs + E val/test evals,
    # figures off in every fuzz draw so joint_run_fusible holds).
    c["fused_unit"] = rng.random() < 0.4
    return c


# ----------------------------------------------------------------------
# One lockstep run from a sampled dict
# ----------------------------------------------------------------------
def run_sampled_twin(ref_mod, data, c: dict) -> None:
    import reference_twin as rt

    dr = sys.modules["DataRetrieval"]
    single = c["prompt_mode"] == "single"
    if c["new_prompts"]:
        # the drivers seed the PROCESS-GLOBAL stream (ZERO_JOINT_BOUNDS.py:9-14)
        random.seed(27)
        prompts = dr.create_prompts(CLASS_NAMES, True, c["train_logit_diff"])
    elif single:
        prompts = dr.basic_create_prompts(CLASS_NAMES)
    else:
        prompts = dr.create_prompts(CLASS_NAMES)

    shared = c["wiring"] == "shared"
    configure_reference(
        ref_mod,
        shared=shared,
        image_model=c["wiring"] != "only-text",
        text_model=c["wiring"] != "only-image",
        model_used=c["adapter"],
        optim=c["optim"],
        max_emb=c["prompt_mode"] == "max",
        train_logit_diff=c["train_logit_diff"],
        pred_logit_diff=c["pred_logit_diff"],
        change_labels=c["change_labels"],
        new_prompts=c["new_prompts"],
    )

    bs, ebs = c["batch_size"], c["eval_batch_size"]
    shuffle_seed = c["shuffle_seed"]
    orders = None

    if c["regime"] == "joint":
        if shuffle_seed is not None:
            orders = recover_loader_order(
                data["train_x"], data["train_y"], bs, shuffle_seed, c["epochs"])
        ref_rec, ref_trainer, init_params = run_reference_joint(
            ref_mod, prompts, data, epochs=c["epochs"], lr=c["lr"],
            batch_size=bs, eval_batch_size=ebs, single_prompt=single,
            train_shuffle_seed=shuffle_seed,
        )
    elif c["regime"] == "data-inc":
        if shuffle_seed is not None:
            orders = []
            for pi, r in enumerate(contiguous_parts(N_TRAIN, c["parts"])):
                orders.extend(recover_loader_order(
                    data["train_x"][r.start:r.stop],
                    data["train_y"][r.start:r.stop],
                    bs, shuffle_seed + pi, c["epochs"]))
        ref_rec, ref_trainer, init_params = run_reference_data_incremental(
            ref_mod, prompts, data, parts=c["parts"], epochs=c["epochs"],
            lr=c["lr"], batch_size=bs, eval_batch_size=ebs,
            single_prompt=single, continual=c["continual"],
            threshold=c.get("threshold", 0.01), adder=c.get("adder", 0.001),
            threshold_scheduling=c.get("threshold_scheduling", False),
            train_shuffle_seed=shuffle_seed,
        )
    else:
        idx_sets = ([np.arange(r.start, r.stop)
                     for r in contiguous_parts(N_TRAIN, 5)]
                    if c["mode"] == "class-pos-neg"
                    else label_parts(data["train_y"]))
        if shuffle_seed is not None:
            orders = []
            for ti, idx in enumerate(idx_sets):
                orders.extend(recover_loader_order(
                    data["train_x"][idx], data["train_y"][idx], bs,
                    shuffle_seed + ti, c["epochs"]))
        ref_rec, ref_trainer, init_params = run_reference_class_incremental(
            ref_mod, prompts, data, mode=c["mode"],
            more_labels=c["more_labels"], epochs=c["epochs"], lr=c["lr"],
            batch_size=bs, eval_batch_size=ebs, single_prompt=single,
            continual=c["continual"], threshold=c.get("threshold", 0.01),
            adder=c.get("adder", 0.001),
            threshold_scheduling=c.get("threshold_scheduling", False),
            tasks_order=c["tasks_order"], train_shuffle_seed=shuffle_seed,
        )

    cfg_kw = dict(
        batch_size=bs, eval_batch_size=ebs, lr=c["lr"], epochs=c["epochs"],
        plot_figures="off", adapter=c["adapter"], optim=c["optim"],
        prompt_mode=c["prompt_mode"],
        train_logit_diff=c["train_logit_diff"],
        pred_logit_diff=c["pred_logit_diff"],
        change_labels=c["change_labels"], new_prompts=c["new_prompts"],
        fused_epoch=c["fused"] or c["fused_unit"],
        fused_unit=c["fused_unit"], shuffle_train=shuffle_seed is not None,
        shared=shared,
        image_adapter=c["wiring"] != "only-text",
        text_adapter=c["wiring"] != "only-image",
        max_gap_per_class=c["prompt_mode"] == "max",
    )
    if c["regime"] == "joint":
        cfg_kw["mode"] = "joint"
        runner = protocols.run_zero_joint
    elif c["regime"] == "data-inc":
        cfg_kw.update(mode="data-inc", parts=c["parts"],
                      continual_learning=c["continual"],
                      threshold=c.get("threshold", 0.01),
                      adder=c.get("adder", 0.001),
                      threshold_scheduling=c.get("threshold_scheduling", False))
        runner = protocols.run_data_incremental
    else:
        cfg_kw.update(mode=c["mode"], more_labels=c["more_labels"],
                      continual_learning=c["continual"],
                      threshold=c.get("threshold", 0.01),
                      adder=c.get("adder", 0.001),
                      threshold_scheduling=c.get("threshold_scheduling", False))
        if c["tasks_order"] is not None:
            cfg_kw["tasks_order"] = c["tasks_order"]
        runner = protocols.run_class_incremental
    cfg = ExperimentConfig(**cfg_kw)

    bundle = protocols.DataBundle(
        train=EmbeddingDataset(data["train_x"], data["train_y"]),
        val=EmbeddingDataset(data["val_x"], data["val_y"]),
        test=EmbeddingDataset(data["test_x"], data["test_y"]),
    )
    bank = build_prompt_bank(synthetic_encode_fn(seed=123), prompts,
                             CLASS_NAMES,
                             train_logit_diff=c["train_logit_diff"])
    perm = None if orders is None else (lambda k, n: orders[k])
    with patched_protocols(init_params, permutation_source=perm) as fw_rec:
        results = runner(cfg, bundle, bank, log_dir=None)

    # CL x SGD-0.1 is the measured fp32 knife edge (PARITY.md "reset MASK"
    # note; found AT TOY SCALE by this fuzzer, seeds 37/42): the reference's
    # min + t*(max-min) mask slices the bulk of the per-step |delta|
    # distribution, a handful of comparisons flip on fp32 rounding between
    # torch and XLA, and at lr 0.1 each flip moves a parameter visibly
    # (measured here: val/Loss 1.3e-5, params 5e-5) while staying
    # loss-neutral at the flipped step.  Tolerances widen to sit above the
    # flip noise but far below any semantic-mismatch signal (the mutation
    # meta-test's MAX-vs-MEAN mismatch measures 7.6e-3).
    knife_edge = c["continual"] is not None and c["optim"] == "sgd"
    loss_atol = 1e-4 if knife_edge else LOSS_ATOL
    param_atol = 1e-3 if knife_edge else PARAM_ATOL
    count_atol = 16.0 if knife_edge else 2.0
    for tag in ("train/Loss", "val/Loss"):
        assert_stream_match(ref_rec.scalars, fw_rec.scalars, tag,
                            atol=loss_atol)
    for tag in METRIC_TAGS:
        assert_stream_match(ref_rec.scalars, fw_rec.scalars, tag,
                            atol=METRIC_ATOL)
    if c["prompt_mode"] == "max":
        for tag in ("max-mean-comparison/pos", "max-mean-comparison/neg"):
            assert_stream_match(ref_rec.scalars, fw_rec.scalars, tag,
                                atol=1e-5 if not knife_edge else 1e-4)
    if c["continual"] is not None:
        monitors = [("monitor-resets/resets", count_atol),
                    ("monitor-resets/updates", count_atol),
                    ("monitor-resets/percentage resets", 1e-4)]
        if c.get("threshold_scheduling"):
            monitors.append(("monitor-resets/threshold-scheduling", 1e-7))
        for tag, atol in monitors:
            assert_stream_match(ref_rec.scalars, fw_rec.scalars, tag,
                                atol=atol)
    final_ref = rt.reference_final_params(ref_trainer, shared)
    assert max_param_diff(final_ref, results["trainer"].params) < param_atol


@pytest.mark.parametrize("seed", FUZZ_SEEDS)
def test_twin_fuzz(ref_mod, data, seed):
    c = sample_config(seed)
    try:
        run_sampled_twin(ref_mod, data, c)
    except Exception as e:  # noqa: BLE001 - attach the sampled config
        raise AssertionError(
            f"sampled twin config failed (seed {seed}): {c}") from e


def test_sampler_covers_the_space():
    """The sampler must actually reach every regime, wiring, prompt mode,
    CL mode and both engine paths within a modest seed budget — otherwise
    the fuzz tests silently degenerate to one corner of the space."""
    draws = [sample_config(s) for s in range(200)]
    assert {d["regime"] for d in draws} == {"joint", "data-inc", "class-inc"}
    assert {d["wiring"] for d in draws} == {"double", "shared", "only-image",
                                            "only-text"}
    assert {d["prompt_mode"] for d in draws} == {"single", "mean", "max"}
    assert {d.get("continual") for d in draws} == {None, "myCL", "profCL"}
    assert {d["fused"] for d in draws} == {True, False}
    assert any(d["fused_unit"] and d["regime"] != "joint" for d in draws)
    # the joint whole-run fold (train_joint_run) must get sampling pressure
    assert any(d["fused_unit"] and d["regime"] == "joint" for d in draws)
    assert any(d["shuffle_seed"] is not None for d in draws)
    assert any(d["new_prompts"] for d in draws)
    assert any(d.get("more_labels") for d in draws)
    assert any(d.get("tasks_order") for d in draws)
    # validity predicates hold on every draw
    for d in draws:
        if d["prompt_mode"] == "single":
            assert not d["new_prompts"]
        if d["new_prompts"]:
            assert d["train_logit_diff"]
        if d["regime"] == "joint":
            assert d["continual"] is None
