"""Experiment configuration.

Replaces the reference's module-level globals (``Trainer.py:41-57``) and the
hard-coded ``__main__`` constants of its drivers (``ZERO_JOINT_BOUNDS.py:16-31``,
``DATA_INCREMENTAL.py:44-68``, ``CLASS_INCREMENTAL.py:32-57``) with a frozen
dataclass.  The reference persists its configuration only through the
TensorBoard run-directory string (``Trainer.py:256-523``); :func:`run_name`
re-emits that exact string format (including the reference's
``-only-text-adapeter`` typo on the incremental paths) so existing dashboards
and tooling keep working.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

CHEXPERT_COMPETITION_TASKS: Tuple[str, ...] = (
    "Atelectasis",
    "Cardiomegaly",
    "Consolidation",
    "Edema",
    "Pleural Effusion",
)

JOINT_FEATURE_SIZE = 128
NUM_CLASSES = 5
DEFAULT_SEED = 27  # reference: ZERO_JOINT_BOUNDS.py:9-14


class AdapterKind(str, enum.Enum):
    """Which trainable head sits on each tower (reference ``MODEL_USED``)."""

    MLP = "mlp"  # Linear(128,256) + ReLU + Linear(256,128)   (models.py:7-15)
    DENSE = "dense"  # Linear(128,128)                        (models.py:18-26)
    NO_HEAD = "no-head"  # identity (zero-shot only)


class PromptMode(str, enum.Enum):
    """Prompt-ensemble reduction (reference ``basic_prompts`` / ``MAX_EMB``)."""

    SINGLE = "single"  # one prompt per polarity (DataRetrieval.py:183-197)
    MEAN = "mean"  # mean of prompt embeddings after the adapter (Trainer.py:1666)
    MAX = "max"  # per-prompt cosine, max over prompts (Trainer.py:1689-1703)


class Optim(str, enum.Enum):
    ADAM = "adam"
    SGD = "sgd"


class ContinualLearning(str, enum.Enum):
    MY_CL = "myCL"  # per-step weight reset (Trainer.py:592-594, 1556-1587)
    PROF_CL = "profCL"  # per-epoch weight reset (Trainer.py:1589-1632)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Full configuration of a run (any of the reference's three drivers)."""

    # --- adapters (Trainer.py:41-47) ---
    shared: bool = False  # one module serves as both adapters
    image_adapter: bool = True
    text_adapter: bool = True
    adapter: AdapterKind = AdapterKind.MLP
    optim: Optim = Optim.ADAM

    # --- prompting (Trainer.py:49-50) ---
    prompt_mode: PromptMode = PromptMode.MEAN
    new_prompts: bool = False  # MedCLIP-style compositional bank (new_texts_prompts.py)

    # MAX-mode gap monitor stream shape: False logs ONE per-step scalar
    # pair (mean over the trained classes); True reproduces the reference's
    # RAW stream exactly — one max-mean-comparison/{pos,neg} scalar per
    # trained class per batch at its own running counter
    # (Trainer.py:1689-1703, pos_mean_counter/neg_mean_counter).
    max_gap_per_class: bool = False

    # --- logit construction (Trainer.py:52-56) ---
    train_logit_diff: bool = True  # train logit = pos - neg, else pos only
    pred_logit_diff: bool = False  # score = (pos-neg+2)/4, else (pos+1)/2
    change_labels: bool = False  # labels {0,1} -> {-1,+1} (Trainer.py:1707-1728)

    # --- data ---
    chex_competition: bool = True
    xrays_position: str = "all"  # "all" | "frontal"
    batch_size: int = 6144
    eval_batch_size: int = 1024  # reference fixes val/test bs (Trainer.py:241-246)

    # --- optimisation ---
    lr: float = 1e-4
    epochs: int = 10
    loss_name: str = "standard"
    seed: int = DEFAULT_SEED
    # Per-step LR schedule (the reference's optional per-batch
    # scheduler.step(), Trainer.py:598-601; its drivers import
    # ExponentialLR but never enable it).
    lr_schedule: Optional[str] = None  # None | "exponential"
    lr_gamma: float = 0.999

    # --- incremental protocol ---
    mode: str = "joint"  # "joint" | "zero" | "data-inc" | "class-pos" | "class-pos-neg"
    parts: int = 1  # data-incremental number of parts (5 / 10 / 20)
    more_labels: bool = False  # growing logit vector (Trainer.py:682-756)
    tasks_order: Tuple[int, ...] = (0, 1, 2, 3, 4)

    # --- continual learning (weight reset) ---
    continual_learning: Optional[ContinualLearning] = None
    threshold: float = 0.01
    ratio: bool = True
    adder: float = 0.001
    threshold_scheduling: bool = False

    # --- bookkeeping ---
    folder_name: Optional[str] = None  # run-dir root; default depends on mode
    run_dir_root: str = "runs"

    # --- TPU execution (no reference counterpart: reference is single-GPU) ---
    compute_dtype: str = "float32"  # "float32" | "bfloat16" for the encoders
    data_axis: str = "data"  # 1-D mesh axis name for batch sharding
    # Run each training epoch as ONE on-device lax.scan over HBM-resident
    # data (engine/steps.py::build_fused_epoch); falls back to the per-batch
    # path on a multi-chip mesh or non-resident batch sources.
    fused_epoch: bool = True
    # Fuse ALL epochs of each incremental unit (a data-inc part / class-inc
    # task) into ONE dispatched program — lax.scan over epochs around the
    # fused epoch, with the myCL threshold schedule, per-epoch shuffle
    # orders, and the profCL snapshot/reset as operands/on-device steps
    # (engine/steps.py::build_fused_unit).  The post-unit val/test eval
    # passes fold into the same program (eval_mode="final"); joint mode
    # fuses its WHOLE run with per-epoch evals (eval_mode="per_epoch" —
    # the reference evaluates between epochs, ZERO_JOINT_BOUNDS.py:33-45);
    # the incremental protocols fold their WHOLE run too when every unit
    # pads to the same slab (split_contiguous parts/tasks always do —
    # engine/steps.py::build_fused_run scans over units).  Both whole-run
    # folds return each epoch's/unit's own metric streams, eval results,
    # and post-epoch/unit TrainState as stacked outputs, so checkpoints
    # and plot_figures="reference" live-params figures stay exact.  Collapses
    # every per-epoch / per-eval dispatch+readback round-trip (~30-750 ms
    # each through a tunneled link) to one per unit.  Opt-in: the unit
    # program is a NEW compile (minutes through a remote-compile terminal
    # the first time).  Requires fused_epoch; ignored for native batch
    # sources.
    fused_unit: bool = False
    # Reference trains with a reshuffling DataLoader (Trainer.py:238-240).
    # False iterates batches in dataset order — used by most twin-run parity
    # configs (tests/test_twin_run.py) to lockstep against the reference's
    # own Trainer.py.  True reshuffles per epoch (real rows permuted,
    # padding at the tail, both engine paths); the shuffle twin injects the
    # reference DataLoader's exact order via Trainer.permutation_source.
    shuffle_train: bool = True
    # Figure cadence: "reference" re-plots ROC/PR/scatter/t-SNE/heatmaps at
    # every eval like the reference (host-bound: ~10 matplotlib figures per
    # eval); "final" only at the last epoch/part/task; "off" scalars only.
    plot_figures: str = "reference"

    def __post_init__(self) -> None:
        # Accept plain strings for the enum fields.
        object.__setattr__(self, "adapter", AdapterKind(self.adapter))
        object.__setattr__(self, "optim", Optim(self.optim))
        object.__setattr__(self, "prompt_mode", PromptMode(self.prompt_mode))
        if self.continual_learning is not None:
            object.__setattr__(
                self, "continual_learning", ContinualLearning(self.continual_learning)
            )
        if self.shared:
            # Reference force-overrides IMAGE_MODEL/TEXT_MODEL via `global`
            # mutation (Trainer.py:134-137); we validate instead of mutating.
            object.__setattr__(self, "image_adapter", True)
            object.__setattr__(self, "text_adapter", True)
        if self.adapter == AdapterKind.NO_HEAD and (self.image_adapter or self.text_adapter):
            object.__setattr__(self, "image_adapter", False)
            object.__setattr__(self, "text_adapter", False)
        if self.mode == "zero" and self.epochs > 0:
            # mode='zero' with training epochs would emit a 'joint-train-...'
            # run name for a zero-shot run (the reference raises for
            # inconsistent zero-shot flag combos, Trainer.py:294-303)
            raise ValueError("mode='zero' requires epochs=0")
        if self.epochs == 0 and self.mode in ("joint", "zero"):
            object.__setattr__(self, "mode", "zero")
            # Zero-shot requires no-head OR a shared adapter (Trainer.py:294-303).
            if not (self.shared or not (self.image_adapter or self.text_adapter)):
                raise ValueError(
                    "zero-shot (epochs=0) requires adapter='no-head' or shared=True"
                )
        if self.xrays_position not in ("all", "frontal"):
            raise ValueError(f"unsupported xrays_position {self.xrays_position!r}")
        if self.loss_name != "standard":
            raise ValueError("only loss_name='standard' (BCEWithLogits) is supported")
        if self.mode not in ("joint", "zero", "data-inc", "class-pos", "class-pos-neg"):
            raise ValueError(f"unsupported mode {self.mode!r}")

    # ------------------------------------------------------------------
    # Derived properties
    # ------------------------------------------------------------------
    @property
    def single_prompt(self) -> bool:
        return self.prompt_mode == PromptMode.SINGLE

    @property
    def max_emb(self) -> bool:
        return self.prompt_mode == PromptMode.MAX

    @property
    def class_names(self) -> Tuple[str, ...]:
        if not self.chex_competition:
            raise ValueError("only the CheXpert competition task set is supported")
        return CHEXPERT_COMPETITION_TASKS

    @property
    def trains_anything(self) -> bool:
        return self.image_adapter or self.text_adapter

    # ------------------------------------------------------------------
    # Reference-format run name (Trainer.py:256-523)
    # ------------------------------------------------------------------
    def _chex_str(self) -> str:
        return "-chex" if self.chex_competition else ""

    def _str_basic(self) -> str:
        if self.single_prompt:
            return "-single-prompt"
        return "-MAX-prompt" if self.max_emb else "-mean-prompt"

    def _suffix(self, incremental: bool) -> str:
        suffix = "-" + self.adapter.value
        if self.shared:
            suffix += "-SHARED-adapter"
        elif self.image_adapter and self.text_adapter:
            suffix += "-double-adapter"
        elif self.image_adapter:
            suffix += "-only-image-adapter"
        elif self.text_adapter:
            # sic: the reference misspells this on the incremental paths
            # (Trainer.py:401, :489) but not on the joint path (:288).
            suffix += "-only-text-adapeter" if incremental else "-only-text-adapter"
        return suffix

    def _flag_tail(self) -> str:
        tail = ""
        if self.new_prompts:
            tail += "-NEW-PROMPTS"
        tail += "-TRAIN-logit-DIFF" if self.train_logit_diff else "-TRAIN-logit-POS"
        tail += "-PRED-logit-DIFF" if self.pred_logit_diff else "-PRED-logit-POS"
        return tail

    def run_name(self) -> str:
        """Reference-format run-directory path for this configuration."""
        chex_str, str_basic = self._chex_str(), self._str_basic()
        if self.mode in ("joint", "zero"):
            folder = self.folder_name or "zero-and-joint"
            if self.epochs > 0:
                base = (
                    f"{folder}/joint-train-loss-{self.loss_name}-opt-{self.optim.value}"
                    f"-lr-{self.lr}-bs{self.batch_size}-ep{self.epochs}"
                    f"{chex_str}{str_basic}-{self.xrays_position}{self._suffix(False)}"
                )
            else:
                if self.shared and self.image_adapter and self.text_adapter:
                    suffix = "-SHARED-adapter-" + self.adapter.value
                else:
                    suffix = "-no-head"
                base = (
                    f"{folder}/zero-shot-model{chex_str}{str_basic}"
                    f"-{self.xrays_position}{suffix}"
                )
            return base + self._flag_tail()

        cl = self.continual_learning
        thre_str = ""
        if self.threshold_scheduling and cl is not None:
            thre_str = f"-th-scheduled-{self.adder}"
        cl_str = ""
        if cl is not None and self.ratio:
            cl_str = f"-{cl.value}-ratio-{self.threshold}"
        mode_str = ("gradient-clipping-" if cl is not None and self.ratio else "fine-tuning-") + self.mode

        if self.mode == "data-inc":
            folder = self.folder_name or f"data-incremental-{self.parts}-parts"
            base = (
                f"{folder}/{mode_str}-loss-{self.loss_name}-opt-{self.optim.value}"
                f"-lr-{self.lr}-bs{self.batch_size}-ep{self.epochs}-parts{self.parts}"
                f"{chex_str}{str_basic}-{self.xrays_position}{self._suffix(True)}"
                f"{cl_str}{thre_str}"
            )
            return base + self._flag_tail() + "-DD"

        # class-incremental ("class-pos" / "class-pos-neg")
        folder = self.folder_name or (self.mode + ("-more-labels" if self.more_labels else ""))
        base = (
            f"{folder}/{mode_str}-loss-{self.loss_name}-opt-{self.optim.value}"
            f"-lr-{self.lr}-bs{self.batch_size}-ep{self.epochs}"
            f"{chex_str}{str_basic}-{self.xrays_position}{self._suffix(True)}"
            f"{cl_str}{thre_str}"
        )
        if self.more_labels:
            base += "-MORE-LABELS"
        return base + self._flag_tail() + "-DD"


def joint_config(**kw) -> ExperimentConfig:
    """Defaults of ``ZERO_JOINT_BOUNDS.py:16-31`` (joint upper bound)."""
    kw.setdefault("mode", "joint")
    kw.setdefault("lr", 1e-4)
    kw.setdefault("epochs", 10)
    return ExperimentConfig(**kw)


def zero_shot_config(**kw) -> ExperimentConfig:
    """Zero-shot bound: epochs=0, frozen encoders, no head."""
    kw.setdefault("mode", "zero")
    kw.setdefault("epochs", 0)
    kw.setdefault("shared", False)
    kw.setdefault("adapter", AdapterKind.NO_HEAD)
    kw.setdefault("image_adapter", False)
    kw.setdefault("text_adapter", False)
    return ExperimentConfig(**kw)


def data_incremental_config(**kw) -> ExperimentConfig:
    """Defaults of ``DATA_INCREMENTAL.py:44-68``."""
    kw.setdefault("mode", "data-inc")
    kw.setdefault("parts", 20)
    kw.setdefault("xrays_position", "frontal")
    kw.setdefault("threshold_scheduling", True)
    return ExperimentConfig(**kw)


def class_incremental_config(**kw) -> ExperimentConfig:
    """Defaults of ``CLASS_INCREMENTAL.py:32-57``."""
    kw.setdefault("mode", "class-pos-neg")
    kw.setdefault("more_labels", True)
    return ExperimentConfig(**kw)
