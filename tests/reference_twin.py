"""Twin-run harness: execute the reference's OWN ``Trainer.py`` as ground truth.

Every other parity test in this suite compares the framework against a
*re-implementation* of the reference's math (torch fixtures).  This module
instead imports and runs ``/root/reference/Trainer.py`` itself — the actual
1,729-line training engine — on tiny synthetic embedding datasets, so a
shared misreading of its bookkeeping (``Trainer.py:526-1072``,
``:1556-1632``) cannot hide.

Only three genuinely-absent imports are stubbed (``sys.modules``), exactly as
scoped by the round-2 review:

* ``torchvision`` — absent from this environment; substituted by the
  FUNCTIONAL primitive stub in ``tests/torchvision_stub.py`` (real v1.5
  ResNet base class, PIL transforms, ``io.read_image``), which lets the
  vendored image stack (``health_multimodal/image/**``, ``DataRetrieval.py``)
  execute as twin ground truth too (``tests/test_twin_image_stack.py``);
  the Trainer training path itself only touches it through the epoch-1
  pre-rendered PNG re-log;
* ``torchmetrics.functional.pairwise_cosine_similarity`` — re-stated with the
  exact torchmetrics math (row-L2-normalise both operands, matmul);
* ``health_multimodal.text.get_cxr_bert_inference`` — a deterministic fake
  text encoder (the CXR-BERT weights are not in this environment); the SAME
  prompt->embedding function feeds the framework's PromptBank, so the two
  sides see identical raw prompt embeddings and the comparison isolates the
  training/eval engines.

The reference's visual-only ``TSNE`` attribute is additionally patched
(sklearn>=1.2 raises on 10-sample t-SNE; the substitute only feeds figures,
never the compared scalar streams).

Trust boundary: this harness imports and EXECUTES ``/root/reference``
(public, untrusted code) inside the test process — that is the point of a
twin run and is acceptable because the mount is read-only, but it means
``pytest tests/`` runs that code.  The ``sys.modules`` stubs must stay
exhaustive for every package the reference imports transitively
(torchvision, torchmetrics, health_multimodal) so no *other* vendored
reference package gets imported as a side effect; the real-text-stack
variant below loads exactly four vendored text files by explicit path and
nothing else.
"""

from __future__ import annotations

import contextlib
import importlib
import sys
import types
from typing import Dict, List, Sequence, Tuple

import numpy as np

REF_DIR = "/root/reference"
EMB_DIM = 128

# ----------------------------------------------------------------------
# Script-execution helpers (utility/driver-script twins): the reference
# scripts hard-code Windows paths, which on Linux are ordinary relative
# filenames containing backslashes — materialising files under those
# literal names in a temp cwd lets runpy execute the scripts UNPATCHED.
# ----------------------------------------------------------------------
chdir = contextlib.chdir  # stdlib since 3.11; alias keeps call sites short


@contextlib.contextmanager
def serial_dataloaders():
    """Clamp torch DataLoader workers to 0 — an execution-environment knob,
    not semantics: the committed scripts use 1-4 forked workers, which are
    hang-prone in a JAX-initialised 1-vCPU test process; with their
    ``shuffle=False`` extraction loaders (and single-batch training
    loaders) the order and math are identical at ``num_workers=0``."""
    import torch.utils.data as tud

    orig = tud.DataLoader.__init__

    def patched(self, *args, **kwargs):
        kwargs["num_workers"] = 0
        orig(self, *args, **kwargs)

    tud.DataLoader.__init__ = patched
    try:
        yield
    finally:
        tud.DataLoader.__init__ = orig


@contextlib.contextmanager
def reference_script_env(cwd):
    """chdir + serial loaders + torch>=2.6 pickle allowlist for the three
    Dataset classes the reference's scripts save/load whole (its code
    predates the ``weights_only=True`` default; ``load_torch_pt`` passes
    ``weights_only=False`` itself)."""
    import torch
    from torch.utils.data import ConcatDataset, Subset, TensorDataset

    with chdir(cwd), serial_dataloaders(), torch.serialization.safe_globals(
        [TensorDataset, ConcatDataset, Subset]
    ):
        yield


def run_reference_script(relpath: str, cwd) -> dict:
    """runpy-execute ``/root/reference/<relpath>`` as ``__main__`` in
    ``cwd`` and return its globals."""
    import os
    import runpy

    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    with reference_script_env(cwd):
        return runpy.run_path(
            os.path.join(REF_DIR, relpath), run_name="__main__"
        )


def mkflat_parent(cwd, flat_name: str) -> None:
    """torch>=2.6's save() checks that the backslash-split 'parent' of a
    relative path exists even on Linux; a flat directory bearing that
    literal name satisfies the check while the artifact still lands under
    the flat backslash filename the scripts later load."""
    parent = flat_name.rsplit("\\", 1)[0]
    (cwd / parent).mkdir(exist_ok=True)


# ----------------------------------------------------------------------
# Deterministic prompt encoder shared by BOTH sides
# ----------------------------------------------------------------------
def fake_encode(texts: Sequence[str], seed: int = 123) -> np.ndarray:
    """THE framework encoder (text/bank.synthetic_encode_fn), not a copy:
    the twin design requires the reference side's prompt embeddings to be
    byte-identical to the framework bank's — a re-implementation would
    silently desync the moment the scheme changes."""
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        synthetic_encode_fn,
    )

    return synthetic_encode_fn(seed=seed, emb_dim=EMB_DIM)(list(texts))


class FakeTextEngine:
    """Deterministic stand-in for TextInferenceEngine
    (health_multimodal/text/inference_engine.py:50-70): returns the
    shared fake embeddings, always under no_grad like the original's
    decorator."""

    def get_embeddings_from_prompt(self, prompts, normalize=True, verbose=True):
        import torch

        if isinstance(prompts, str):
            prompts = [prompts]
        with torch.no_grad():
            emb = torch.from_numpy(fake_encode(list(prompts)))
            if normalize:
                emb = emb / emb.norm(p=2, dim=1, keepdim=True)
        return emb


# What get_cxr_bert_inference() hands the reference Trainer; swapped by
# real_text_stack() for twins that run the vendored tokenize->CXR-BERT->
# projection path as ground truth.
_text_engine_factory = [FakeTextEngine]


# ----------------------------------------------------------------------
# sys.modules stubs for the three absent imports
# ----------------------------------------------------------------------
def _stub_module(name: str) -> types.ModuleType:
    """ModuleType with a real (loader-less) __spec__: a bare ModuleType's
    __spec__ is None, which makes importlib.util.find_spec RAISE for any
    later availability probe (e.g. transformers' _is_package_available)."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def _install_stubs() -> None:
    # FUNCTIONAL torchvision primitives (tests/torchvision_stub.py): the
    # v1.5 ResNet base class, PIL transforms, io.read_image — so the
    # vendored image stack (health_multimodal/image/**, DataRetrieval.py)
    # can execute as twin ground truth, not just Trainer.py.
    import torchvision_stub

    torchvision_stub.install()

    if "torchmetrics" not in sys.modules:
        tm = _stub_module("torchmetrics")
        tm_f = _stub_module("torchmetrics.functional")

        def pairwise_cosine_similarity(x, y=None, reduction=None, zero_diagonal=None):
            # exact torchmetrics math AND signature: reduction is the 3rd
            # positional, and zero_diagonal defaults to True for the
            # self-comparison case (y=None) exactly like the real library —
            # a divergent default here would validate the framework against
            # the stub while BOTH differ from the real reference
            if zero_diagonal is None:
                zero_diagonal = y is None
            y = x if y is None else y
            xn = x / x.norm(p=2, dim=1, keepdim=True)
            yn = y / y.norm(p=2, dim=1, keepdim=True)
            d = xn @ yn.T
            if zero_diagonal:
                d.fill_diagonal_(0)
            if reduction not in (None, "none"):
                raise NotImplementedError(f"stub: reduction={reduction!r}")
            return d

        tm_f.pairwise_cosine_similarity = pairwise_cosine_similarity
        tm.functional = tm_f
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.functional"] = tm_f

    if "health_multimodal" not in sys.modules:
        # pre-empt the real vendored package (pulls torchvision/transformers)
        hm = _stub_module("health_multimodal")
        hm_text = _stub_module("health_multimodal.text")

        # dispatch at call time so tests can swap in the REAL vendored text
        # stack (see real_text_stack below); Trainer binds this function
        # once at import (`from health_multimodal.text import ...`)
        hm_text.get_cxr_bert_inference = lambda: _text_engine_factory[0]()
        hm.text = hm_text
        sys.modules["health_multimodal"] = hm
        sys.modules["health_multimodal.text"] = hm_text


# ----------------------------------------------------------------------
# REAL vendored text stack (VERDICT r3 item 1): run the reference's own
# tokenizer conventions (text/data/io.py:17-58), TextInferenceEngine
# (inference_engine.py:37-70) and CXRBertModel numerics
# (modelling_cxrbert.py:52-141) as twin ground truth, narrowing the text
# stub to weights-only (a small random-init config; the actual CXR-BERT
# weights are not in this environment).
# ----------------------------------------------------------------------
def _load_vendored(dotted: str, relpath: str):
    """Load ONE vendored reference file under its exact dotted module name
    (so its internal absolute imports resolve), creating empty parent
    package stubs as needed.  Only the four torchvision-free text files
    are ever loaded this way."""
    import importlib.util
    from pathlib import Path

    if dotted in sys.modules:
        return sys.modules[dotted]
    # the import machinery resolves relative imports (model.py's
    # ``from .resnet import ...``) through the full ancestor chain, so every
    # missing ancestor needs a package stub, not just the direct parent
    parts = dotted.split(".")
    for depth in range(1, len(parts)):
        ancestor = ".".join(parts[:depth])
        if ancestor not in sys.modules:
            sys.modules[ancestor] = _stub_module(ancestor)
    parent = dotted.rsplit(".", 1)[0]
    spec = importlib.util.spec_from_file_location(dotted, str(Path(REF_DIR) / relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        # CPython's import machinery removes the entry on failure; so must
        # we, or the next caller gets the half-executed module from the
        # fast path above and fails with an AttributeError that masks the
        # root cause
        sys.modules.pop(dotted, None)
        raise
    setattr(sys.modules[parent], dotted.rsplit(".", 1)[1], mod)
    return mod


def load_vendored_text_modules():
    """-> (TextInferenceEngine cls, CXRBertModel cls, CXRBertConfig cls)."""
    _install_stubs()  # the health_multimodal/.text package stubs must exist
    io_mod = _load_vendored(
        "health_multimodal.text.data.io", "health_multimodal/text/data/io.py"
    )
    cfg_mod = _load_vendored(
        "health_multimodal.text.model.configuration_cxrbert",
        "health_multimodal/text/model/configuration_cxrbert.py",
    )
    model_mod = _load_vendored(
        "health_multimodal.text.model.modelling_cxrbert",
        "health_multimodal/text/model/modelling_cxrbert.py",
    )
    import dataclasses as _dc

    if not _dc.is_dataclass(model_mod.CXRBertOutput):
        # the vendored class predates transformers' requirement that
        # ModelOutput subclasses be @dataclass with at most one required
        # field; apply the decorator post-hoc with logits defaulted (pure
        # structure, zero numerics) so forward() can construct it
        model_mod.CXRBertOutput.logits = None
        model_mod.CXRBertOutput = _dc.dataclass(model_mod.CXRBertOutput)
    eng_mod = _load_vendored(
        "health_multimodal.text.inference_engine",
        "health_multimodal/text/inference_engine.py",
    )
    del io_mod
    # the vendored vlp engine does `from health_multimodal.text import
    # TextInferenceEngine` — expose it on the package stub
    sys.modules["health_multimodal.text"].TextInferenceEngine = (
        eng_mod.TextInferenceEngine
    )
    return eng_mod.TextInferenceEngine, model_mod.CXRBertModel, cfg_mod.CXRBertConfig


def make_real_text_engine(
    vocab_file, seed: int = 3, hidden: int = 64, layers: int = 2, heads: int = 2,
    intermediate: int = 128, max_pos: int = 64,
):
    """Random-init vendored CXRBertModel (projection_size=128) wrapped in the
    REAL vendored TextInferenceEngine over a real BertTokenizer."""
    import torch
    from transformers import BertTokenizer

    EngineCls, ModelCls, ConfigCls = load_vendored_text_modules()
    tokenizer = BertTokenizer(vocab_file=str(vocab_file))
    cfg = ConfigCls(
        projection_size=EMB_DIM,
        vocab_size=tokenizer.vocab_size,
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=intermediate,
        max_position_embeddings=max_pos,
    )
    torch.manual_seed(seed)
    model = ModelCls(cfg)
    model.eval()
    engine = EngineCls(tokenizer=tokenizer, text_model=model)
    assert engine.is_in_eval()
    return engine




def make_paired_text_engines(tmp_path, seed: int = 3):
    """(vendored TextInferenceEngine, framework TextInferenceEngine) over
    the SAME random-init CXR-BERT weights and the same tiny test vocab —
    the building block for every twin that needs both text stacks live."""
    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        convert_cxr_bert_state_dict,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
        TextInferenceEngine as FwEngine,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
        PromptTokenizer,
        write_test_vocab,
    )

    vocab = write_test_vocab(tmp_path / "twin_vocab.txt")
    engine = make_real_text_engine(vocab, seed=seed)
    params, dims = convert_cxr_bert_state_dict(
        engine.model.state_dict(), num_heads=engine.model.config.num_attention_heads
    )
    fw_engine = FwEngine(params, dims, PromptTokenizer(vocab))
    return engine, fw_engine


@contextlib.contextmanager
def real_text_stack(tmp_path, seed: int = 3):
    """Swap the twin's text ground truth from the hash fake to the REAL
    vendored stack, and yield an ``encode_fn`` that runs the SAME weights
    through this framework's tokenize->BERT->projection path
    (models/convert.py + text/engine.py) for the PromptBank build.

    Inside the context the only remaining whole-component stub on the
    reference side is torchvision."""
    engine, fw_engine = make_paired_text_engines(tmp_path, seed=seed)
    prev = _text_engine_factory[0]
    _text_engine_factory[0] = lambda: engine
    try:
        yield fw_engine.encode_fn(normalize=False), engine
    finally:
        _text_engine_factory[0] = prev


# ----------------------------------------------------------------------
# REAL vendored image stack: run the reference's own ImageModel /
# ResNetHIML / MLP projector (health_multimodal/image/model/*.py),
# transforms (data/transforms.py), loader (data/io.py) and inference
# engine as twin ground truth.  torchvision itself is absent from this
# environment; tests/torchvision_stub.py substitutes the *primitives*
# (ResNet base class, PIL transforms, read_image) so only library code is
# stubbed, never reference code.
# ----------------------------------------------------------------------
def _install_imaging_lib_stubs() -> None:
    """The vendored image/data/io.py imports pydicom/SimpleITK/skimage at
    module level; only ``skimage.io.imread`` is on the JPEG/PNG path the
    twins exercise — implement it with PIL.  The DICOM/NIfTI libs get
    loader-less stubs whose attributes raise on use."""
    if "skimage" not in sys.modules:
        sk = _stub_module("skimage")
        sk_io = _stub_module("skimage.io")

        def imread(path):
            from PIL import Image

            return np.asarray(Image.open(path))

        sk_io.imread = imread
        sk.io = sk_io
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = sk_io

    class _Raiser:
        def __init__(self, lib):
            self._lib = lib

        def __call__(self, *a, **k):
            raise RuntimeError(f"twin stub: {self._lib} is not installed")

    for lib in ("pydicom", "SimpleITK"):
        if lib not in sys.modules:
            mod = _stub_module(lib)
            for attr in ("dcmread", "ReadImage", "GetArrayFromImage"):
                setattr(mod, attr, _Raiser(lib))
            sys.modules[lib] = mod


def load_vendored_image_modules():
    """Load the reference's vendored image stack by explicit path, returning
    a dict of the executed modules.  Order matters: resnet/modules before
    model (relative imports), transforms/io before the inference engine
    (absolute imports)."""
    import torchvision_stub

    _install_stubs()
    _install_imaging_lib_stubs()
    mods = {}
    mods["resnet"] = _load_vendored(
        "health_multimodal.image.model.resnet",
        "health_multimodal/image/model/resnet.py",
    )
    # resnet.py's module-level ``from torch.hub import load_state_dict_from_url``
    # would hit the network for pretrained=True; rebind it to the
    # deterministic stub-arch state dict (RNG-stream preserving)
    mods["resnet"].load_state_dict_from_url = (
        torchvision_stub.fake_load_state_dict_from_url
    )
    mods["modules"] = _load_vendored(
        "health_multimodal.image.model.modules",
        "health_multimodal/image/model/modules.py",
    )
    mods["model"] = _load_vendored(
        "health_multimodal.image.model.model",
        "health_multimodal/image/model/model.py",
    )
    mods["transforms"] = _load_vendored(
        "health_multimodal.image.data.transforms",
        "health_multimodal/image/data/transforms.py",
    )
    mods["io"] = _load_vendored(
        "health_multimodal.image.data.io", "health_multimodal/image/data/io.py"
    )
    mods["engine"] = _load_vendored(
        "health_multimodal.image.inference_engine",
        "health_multimodal/image/inference_engine.py",
    )
    # the vlp engine imports the engine classes from the package roots;
    # chexpert-get-embedding.py / test_first_emb.py import the model factory
    sys.modules["health_multimodal.image"].ImageInferenceEngine = (
        mods["engine"].ImageInferenceEngine
    )
    sys.modules["health_multimodal.image"].get_biovil_resnet = (
        mods["model"].get_biovil_resnet
    )
    return mods


def load_vendored_vlp_module():
    """Load the reference's own vlp/inference_engine.py (gaussian-smoothed
    phrase-grounding maps, :59-155) on top of the vendored image + text
    stacks.  Returns (vlp module, image mods dict)."""
    mods = load_vendored_image_modules()
    load_vendored_text_modules()  # exposes TextInferenceEngine on the stub
    vlp = _load_vendored(
        "health_multimodal.vlp.inference_engine",
        "health_multimodal/vlp/inference_engine.py",
    )
    return vlp, mods


def restore_upstream_image_forward(model, model_mod):
    """Rebind one vendored ImageModel instance's forward to the upstream
    hi-ml contract — the block the author commented out at
    model.py:147-153 ('MODIFICA ENORME'): return the full ImageModelOutput
    instead of the bare projected_global_embedding.  The vendored
    inference/vlp engines are dead code without it (they crash, pinned in
    test_twin_image_stack.py); restoring it makes their FULL geometry /
    smoothing / scoring paths executable as twin ground truth.  Everything
    inside still runs the vendored submodules."""
    import types as _types

    import torch

    ImageModelOutput = model_mod.ImageModelOutput

    def forward(self, x):
        with torch.set_grad_enabled(not self.freeze_encoder):
            patch_x, pooled_x = self.encoder(x, return_patch_embeddings=True)
            projected_patch_embeddings = self.projector(patch_x)
            projected_global_embedding = torch.mean(
                projected_patch_embeddings, dim=(2, 3)
            )
        logits = self.classifier(pooled_x) if self.classifier else None
        return ImageModelOutput(
            img_embedding=pooled_x,
            patch_embedding=patch_x,
            class_logits=logits,
            projected_patch_embeddings=projected_patch_embeddings,
            projected_global_embedding=projected_global_embedding,
        )

    model.forward = _types.MethodType(forward, model)
    return model


def make_vendored_image_model(seed: int = 11, model_type: str = "resnet50"):
    """Random-init vendored ImageModel (model.py:88-160): executes the real
    ImageEncoder -> get_encoder_output_dim probe -> 1x1-conv MLP projector
    construction, with deterministic weights."""
    import torch

    mods = load_vendored_image_modules()
    torch.manual_seed(seed)
    model = mods["model"].ImageModel(
        img_model_type=model_type, joint_feature_size=128
    )
    model.eval()
    return model, mods


class _VisualTSNE:
    """Figure-only TSNE substitute (sklearn>=1.2 rejects 10-sample t-SNE);
    never feeds a compared scalar stream."""

    def __init__(self, *a, **k):
        pass

    def fit_transform(self, X):
        X = np.asarray(X, np.float64)
        return X[:, :2].copy()


_ref_mod = None


def load_reference_trainer_module():
    """Import /root/reference/Trainer.py with the three stubs installed."""
    global _ref_mod
    if _ref_mod is not None:
        return _ref_mod
    import matplotlib

    matplotlib.use("Agg")
    _install_stubs()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    _ref_mod = importlib.import_module("Trainer")
    _ref_mod.TSNE = _VisualTSNE
    return _ref_mod


# ----------------------------------------------------------------------
# Reference-side runner
# ----------------------------------------------------------------------
class RefRecorder:
    """SummaryWriter stand-in that records scalars and drops figures."""

    def __init__(self):
        self.scalars: List[Tuple[str, float, int]] = []
        self.log_dir = None

    def add_scalar(self, tag, value, step):
        v = value.item() if hasattr(value, "item") else value
        self.scalars.append((tag, float(v), int(step)))

    def add_figure(self, tag, figure, step=0):
        import matplotlib.pyplot as plt

        plt.close(figure)

    def add_image(self, *a, **k):
        pass


def configure_reference(
    mod,
    *,
    shared: bool = False,
    image_model: bool = True,
    text_model: bool = True,
    model_used: str = "mlp",
    optim: str = "adam",
    max_emb: bool = False,
    train_logit_diff: bool = True,
    pred_logit_diff: bool = False,
    change_labels: bool = False,
    new_prompts: bool = False,
) -> None:
    """Set the reference's module-level config globals (Trainer.py:41-57)."""
    mod.SHARED = shared
    mod.IMAGE_MODEL = image_model
    mod.TEXT_MODEL = text_model
    mod.MODEL_USED = model_used
    mod.OPTIM = optim
    mod.MAX_EMB = max_emb
    mod.NEW_PROMPTS = new_prompts
    mod.TRAIN_LOGIT_DIFF = train_logit_diff
    mod.PRED_LOGIT_DIFF = pred_logit_diff
    mod.CHANGE_LABELS = change_labels


def make_loader(embs: np.ndarray, labels: np.ndarray, batch_size: int,
                shuffle_seed: int = None):
    """Single-process loader.  Default: deterministic (shuffle=False) — the
    twin fixes batch order on both sides.  With ``shuffle_seed`` the loader
    shuffles through a dedicated seeded ``torch.Generator`` exactly like the
    reference's reshuffling DataLoader (Trainer.py:238-246, RandomSampler);
    the framework side replays the identical order via
    :func:`recover_loader_order` + Trainer.permutation_source."""
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    ds = TensorDataset(torch.from_numpy(embs.copy()), torch.from_numpy(labels.copy()))
    if shuffle_seed is None:
        return DataLoader(ds, batch_size=batch_size, shuffle=False, num_workers=0)
    g = torch.Generator()
    g.manual_seed(shuffle_seed)
    return DataLoader(ds, batch_size=batch_size, shuffle=True, num_workers=0,
                      generator=g)


def recover_loader_order(embs: np.ndarray, labels: np.ndarray, batch_size: int,
                         shuffle_seed: int, epochs: int):
    """The EXACT per-epoch row orders a ``make_loader(..., shuffle_seed=s)``
    loader will yield, recovered by content-matching a replica loader
    (robust to torch-internal RNG-consumption details like the per-iterator
    base_seed draw, unlike re-deriving randperm by hand).  Rows must be
    unique (true a.s. for the random fp32 fixtures)."""
    row_index = {}
    for i in range(len(embs)):
        key = embs[i].tobytes()
        assert key not in row_index, "content recovery needs unique rows"
        row_index[key] = i
    replica = make_loader(embs, labels, batch_size, shuffle_seed=shuffle_seed)
    orders = []
    for _ in range(epochs):
        order = []
        for batch_embs, _ in replica:
            order.extend(row_index[r.tobytes()] for r in batch_embs.numpy())
        orders.append(np.asarray(order, np.int64))
    return orders


def contiguous_parts(n: int, parts: int) -> List[range]:
    """The reference's ceil-sized contiguous split ranges (Trainer.py:1214-1231)."""
    import math

    size = math.ceil(n / parts)
    return [range(i * size, min((i + 1) * size, n)) for i in range(parts)]


def label_parts(labels: np.ndarray) -> List[np.ndarray]:
    """split_dataloader_by_label index sets (Trainer.py:1187-1212)."""
    return [np.where(labels[:, i] == 1)[0] for i in range(labels.shape[1])]


def torch_adapter_params(module) -> Dict:
    """Reference nn.Sequential adapter -> this framework's param layout
    (kernel stored (in, out) = torch weight transposed)."""
    sd = module.state_dict()
    out = {
        "dense1": {
            "kernel": sd["layer.0.weight"].T.contiguous().numpy().copy(),
            "bias": sd["layer.0.bias"].numpy().copy(),
        }
    }
    if "layer.2.weight" in sd:
        out["dense2"] = {
            "kernel": sd["layer.2.weight"].T.contiguous().numpy().copy(),
            "bias": sd["layer.2.bias"].numpy().copy(),
        }
    return out


def reference_initial_params(ref_trainer, shared: bool) -> Dict:
    """Snapshot the reference trainer's freshly-initialised adapters in this
    framework's pytree layout ({'shared'|'image'/'text': {...}})."""
    if shared:
        return {"shared": torch_adapter_params(ref_trainer.image_adapter)}
    params: Dict = {}
    if ref_trainer.image_adapter is not None:
        params["image"] = torch_adapter_params(ref_trainer.image_adapter)
    if ref_trainer.text_adapter is not None:
        params["text"] = torch_adapter_params(ref_trainer.text_adapter)
    return params


def reference_final_params(ref_trainer, shared: bool) -> Dict:
    return reference_initial_params(ref_trainer, shared)


# ----------------------------------------------------------------------
# Reference driver loops (mirroring the three __main__ blocks)
# ----------------------------------------------------------------------
CLASS_NAMES = ["Atelectasis", "Cardiomegaly", "Consolidation", "Edema", "Pleural Effusion"]


def run_reference_joint(
    mod, prompts, data, *, single_prompt=False, lr=1e-4, batch_size=64,
    eval_batch_size=64, epochs=3, seed=7, train_shuffle_seed=None,
):
    """ZERO_JOINT_BOUNDS.py:16-72; deterministic loaders unless
    ``train_shuffle_seed`` turns on the reference's reshuffling train
    DataLoader.  Eval loaders stay deterministic on BOTH sides: the sklearn
    metrics are permutation-invariant, but the per-batch val/Loss stream
    (Trainer.py:846-848) is NOT — batch composition changes each value —
    so a real reference run's shuffled eval loaders (Trainer.py:241-246)
    would need the same order-injection treatment as the train twins to
    compare that one stream.  The twin is sound because both sides use the
    same deterministic order; the uncovered regime is only the shuffled
    val/Loss stream shape."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    rec = RefRecorder()
    trainer = mod.Trainer(single_prompt, prompts, CLASS_NAMES, "standard", lr,
                          torch.device("cpu"), rec)
    init_params = reference_initial_params(trainer, mod.SHARED)
    criterion = nn.BCEWithLogitsLoss()
    train_loader = make_loader(data["train_x"], data["train_y"], batch_size,
                               shuffle_seed=train_shuffle_seed)
    val_loader = make_loader(data["val_x"], data["val_y"], eval_batch_size)
    test_loader = make_loader(data["test_x"], data["test_y"], eval_batch_size)
    if epochs > 0:
        for epoch in range(1, epochs + 1):
            trainer.train(train_loader, criterion, epoch, None, 0.5, actual_task=epoch)
            trainer.val(val_loader, criterion, epoch, epochs, mode="joint", tasks_order=None)
            trainer.test(test_loader, criterion, epoch, epochs, mode="joint",
                         tasks_order=None, plot_tsne_array=None)
    else:
        trainer.val(val_loader, criterion, 0, 0, mode="zero", tasks_order=None)
        trainer.test(test_loader, criterion, 0, 0, mode="zero", tasks_order=None,
                     plot_tsne_array=None)
    return rec, trainer, init_params


def run_reference_data_incremental(
    mod, prompts, data, *, lr=1e-4, batch_size=64, eval_batch_size=64,
    parts=3, epochs=2, continual=None, threshold=0.01, adder=0.001,
    threshold_scheduling=True, seed=7, single_prompt=False,
    train_shuffle_seed=None,
):
    """DATA_INCREMENTAL.py:44-97 with deterministic loaders unless
    ``train_shuffle_seed`` turns on per-part reshuffling train DataLoaders
    (part ``i`` seeded ``train_shuffle_seed + i`` so each part's order is
    independently recoverable via :func:`recover_loader_order`)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    rec = RefRecorder()
    trainer = mod.Trainer(single_prompt, prompts, CLASS_NAMES, "standard", lr,
                          torch.device("cpu"), rec)
    init_params = reference_initial_params(trainer, mod.SHARED)
    criterion = nn.BCEWithLogitsLoss()
    n = len(data["train_x"])
    part_loaders = [
        make_loader(data["train_x"][r.start : r.stop], data["train_y"][r.start : r.stop],
                    batch_size,
                    shuffle_seed=None if train_shuffle_seed is None
                    else train_shuffle_seed + i)
        for i, r in enumerate(contiguous_parts(n, parts))
    ]
    val_loader = make_loader(data["val_x"], data["val_y"], eval_batch_size)
    test_loader = make_loader(data["test_x"], data["test_y"], eval_batch_size)
    count = 0
    for part in range(1, parts + 1):
        for epoch in range(1, epochs + 1):
            count += 1
            threshold = threshold + adder
            if threshold_scheduling and continual is not None:
                rec.add_scalar("monitor-resets/threshold-scheduling", threshold, count)
            if continual == "profCL":
                trainer.model_copy()
            trainer.train(part_loaders[part - 1], criterion, epoch, continual,
                          threshold, part=part, epochs=epochs, actual_task=part)
            if continual == "profCL":
                trainer.profIncremental(epoch, epochs, part, threshold)
        trainer.val(val_loader, criterion, part, parts, mode="data-inc", tasks_order=part)
        trainer.test(test_loader, criterion, part, parts, mode="data-inc",
                     tasks_order=part, plot_tsne_array=None)
    return rec, trainer, init_params


def run_reference_class_incremental(
    mod, prompts, data, *, lr=1e-4, batch_size=64, eval_batch_size=64,
    epochs=2, n_tasks=5, mode="class-pos-neg", more_labels=False,
    continual=None, threshold=0.01, adder=0.001, threshold_scheduling=False,
    seed=7, single_prompt=False, tasks_order=None, train_shuffle_seed=None,
):
    """CLASS_INCREMENTAL.py:32-97 with deterministic loaders unless
    ``train_shuffle_seed`` turns on per-task reshuffling train DataLoaders
    (task ``i`` seeded ``train_shuffle_seed + i``, recoverable per task via
    :func:`recover_loader_order`)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    rec = RefRecorder()
    trainer = mod.Trainer(single_prompt, prompts, CLASS_NAMES, "standard", lr,
                          torch.device("cpu"), rec)
    init_params = reference_initial_params(trainer, mod.SHARED)
    criterion = nn.BCEWithLogitsLoss()
    tasks_order = list(tasks_order) if tasks_order is not None else list(range(n_tasks))
    n = len(data["train_x"])
    if mode == "class-pos-neg":
        idx_sets = [np.arange(r.start, r.stop) for r in contiguous_parts(n, 5)]
    else:  # class-pos: per-disease positives, with intersection
        idx_sets = label_parts(data["train_y"])
    task_loaders = [
        make_loader(data["train_x"][idx], data["train_y"][idx], batch_size,
                    shuffle_seed=None if train_shuffle_seed is None
                    else train_shuffle_seed + i)
        for i, idx in enumerate(idx_sets)
    ]
    val_loader = make_loader(data["val_x"], data["val_y"], eval_batch_size)
    test_loader = make_loader(data["test_x"], data["test_y"], eval_batch_size)
    last_batch = 0
    count = 0
    for actual_task in range(1, n_tasks + 1):
        for epoch in range(1, epochs + 1):
            count += 1
            threshold = threshold + adder
            if threshold_scheduling and continual is not None:
                rec.add_scalar("monitor-resets/threshold-scheduling", threshold, count)
            if continual == "profCL" and actual_task > 1:
                trainer.model_copy()
            if not more_labels:
                last_batch = trainer.train_class_incremental(
                    task_loaders[actual_task - 1], criterion, epoch, continual,
                    threshold, tasks_order[actual_task - 1], last_batch, actual_task)
            else:
                last_batch = trainer.train_class_more_labels_incremental(
                    task_loaders[actual_task - 1], criterion, epoch, continual,
                    threshold, tasks_order[actual_task - 1], last_batch, actual_task)
            if continual == "profCL" and actual_task > 1:
                trainer.profIncremental(epoch, epochs, actual_task, threshold)
        trainer.val(val_loader, criterion, actual_task, epochs, mode=mode,
                    tasks_order=tasks_order)
        trainer.test(test_loader, criterion, actual_task, epochs, mode=mode,
                     tasks_order=tasks_order, plot_tsne_array=None)
    return rec, trainer, init_params


# ----------------------------------------------------------------------
# L4 driver scripts executed AS COMMITTED (runpy): the loops above mirror
# the three __main__ blocks for configurable twins; these run the actual
# driver FILES so the glue itself (constant flow, threshold scheduling,
# model_copy guards, last_batch threading, val/test cadence, final save)
# is ground truth too.  Patch boundary: Trainer._preprocessing (the
# torch.load of the author's local embeddingDataset/*.pt — substituted
# with synthetic loaders), SummaryWriter (recorder; the REAL run-name
# construction still executes and is captured), playsound, and the
# drivers' unused `health_multimodal.text.utils` import.
# ----------------------------------------------------------------------
def _install_driver_stubs() -> list:
    """playsound + health_multimodal.text.utils stubs for the driver-script
    imports; returns the (shared) list playsound calls append to."""
    _install_stubs()
    if "playsound" not in sys.modules:
        ps = _stub_module("playsound")
        ps.calls = []
        ps.playsound = lambda path, block=True: ps.calls.append(path)
        sys.modules["playsound"] = ps
    hm_text = sys.modules["health_multimodal.text"]
    if "health_multimodal.text.utils" not in sys.modules:
        hm_utils = _stub_module("health_multimodal.text.utils")
        hm_utils.get_cxr_bert_inference = lambda: _text_engine_factory[0]()
        hm_text.utils = hm_utils
        sys.modules["health_multimodal.text.utils"] = hm_utils
    return sys.modules["playsound"].calls


def run_reference_driver_script(script: str, data, tmp_path, *,
                                eval_batch_size: int = 1024,
                                real_preprocessing_cwd=None):
    """Execute ``/root/reference/<script>`` via runpy with its committed
    constants (seed 27, bs 6144, lr 1e-4, 10 epochs, ...).  The synthetic
    loaders are deterministic and single-batch at the committed batch
    sizes (n_rows < 1024 < 6144), so every compared stream is invariant
    to the reference DataLoaders' reshuffling.  The train loader's dataset
    is a two-chunk ConcatDataset exactly like the author's glued shards
    (glue_dataset.py:33-37), so ``concat_to_tensor_dataloader`` and both
    splitters execute for real on the class/data-incremental paths.

    With ``real_preprocessing_cwd`` set (and ``data=None``), NOTHING on the
    data path is patched: the REAL ``Trainer._preprocessing``
    (Trainer.py:204-256) executes inside that cwd, ``torch.load``-ing the
    committed literal ``embeddingDataset\\...\\embeddings_dataset_final_old.pt``
    paths, building its shuffling DataLoaders (single-batch at the
    committed sizes, so streams stay permutation-invariant) and running
    the real t-SNE subset filters.

    Returns ``(rec, script_globals, init_params, w_path)``; the script's
    final ``trainer.save()`` lands in ``rec.log_dir`` for real."""
    import os
    import runpy

    import torch
    from torch.utils.data import ConcatDataset, DataLoader, TensorDataset

    mod = load_reference_trainer_module()
    sound_calls = _install_driver_stubs()
    n_sounds = len(sound_calls)
    rec = RefRecorder()
    rec.log_dir = str(tmp_path / "ref_run")
    os.makedirs(rec.log_dir, exist_ok=True)
    w_paths: List[str] = []
    captured_inits: List[Dict] = []

    def fake_pre(chex_competition, xrays_position, batch_size):
        assert chex_competition, "drivers run the chex-competition branch"
        halves = []
        for sl in (slice(0, len(data["train_x"]) // 2),
                   slice(len(data["train_x"]) // 2, None)):
            halves.append(TensorDataset(
                torch.from_numpy(data["train_x"][sl].copy()),
                torch.from_numpy(data["train_y"][sl].copy())))
        train_loader = DataLoader(ConcatDataset(halves), batch_size=batch_size,
                                  shuffle=False, num_workers=0)
        val_loader = make_loader(data["val_x"], data["val_y"], eval_batch_size)
        test_loader = make_loader(data["test_x"], data["test_y"], eval_batch_size)
        return (CLASS_NAMES, "-chex", train_loader, val_loader, test_loader,
                None)

    def fake_writer(w_path):
        w_paths.append(w_path)
        return rec

    orig_trainer_cls = mod.Trainer
    orig_pre = orig_trainer_cls.__dict__["_preprocessing"]
    orig_writer_cls = mod.SummaryWriter

    class RecordingTrainer(orig_trainer_cls):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            captured_inits.append(reference_initial_params(self, mod.SHARED))

    if real_preprocessing_cwd is None:
        orig_trainer_cls._preprocessing = staticmethod(fake_pre)
    mod.SummaryWriter = fake_writer
    mod.Trainer = RecordingTrainer
    try:
        with contextlib.ExitStack() as stack:
            if real_preprocessing_cwd is not None:
                assert data is None, "real _preprocessing loads its own data"
                stack.enter_context(reference_script_env(real_preprocessing_cwd))
            g = runpy.run_path(os.path.join(REF_DIR, script), run_name="__main__")
    finally:
        orig_trainer_cls._preprocessing = orig_pre
        mod.SummaryWriter = orig_writer_cls
        mod.Trainer = orig_trainer_cls
    # the incremental drivers swallow exceptions (`except Exception: print`,
    # DATA_INCREMENTAL.py:91-92) — make a silently-dead run loud here
    assert len(sound_calls) == n_sounds + 1, "driver did not reach its finally"
    assert captured_inits, "driver never constructed a Trainer"
    assert stream(rec.scalars, "train/Loss"), "driver trained nothing (swallowed?)"
    return rec, g, captured_inits[0], w_paths[0]


# ----------------------------------------------------------------------
# Stream comparison
# ----------------------------------------------------------------------
def stream(scalars: List[Tuple[str, float, int]], tag: str) -> List[Tuple[int, float]]:
    return [(s, v) for (t, v, s) in scalars if t == tag]


def assert_stream_match(
    ref_scalars, fw_scalars, tag: str, atol: float, rtol: float = 0.0
) -> None:
    r, f = stream(ref_scalars, tag), stream(fw_scalars, tag)
    assert len(r) > 0, f"reference emitted no {tag!r} events"
    assert [s for s, _ in r] == [s for s, _ in f], (
        f"{tag!r}: step sequences differ\n ref={[s for s, _ in r]}\n fw ={[s for s, _ in f]}"
    )
    rv = np.array([v for _, v in r])
    fv = np.array([v for _, v in f])
    if not np.allclose(rv, fv, atol=atol, rtol=rtol):
        worst = int(np.argmax(np.abs(rv - fv)))
        raise AssertionError(
            f"{tag!r}: values diverge (max |d|={np.abs(rv - fv).max():.3e} at "
            f"step {r[worst][0]}: ref={rv[worst]:.6f} fw={fv[worst]:.6f})"
        )


# ----------------------------------------------------------------------
# Framework-side plumbing
# ----------------------------------------------------------------------
def make_fw_recorder():
    """A TBWriter that records scalars in memory (log_dir stays None so the
    protocols skip checkpoint writes)."""
    import matplotlib.pyplot as plt

    from incremental_multimodal_medical_learning_ii_tpu.evaluation.tb import TBWriter

    class FWRecorder(TBWriter):
        def __init__(self):
            super().__init__(None)
            self.scalars: List[Tuple[str, float, int]] = []

        @property
        def enabled(self):
            return True

        def add_scalar(self, tag, value, step):
            self.scalars.append((tag, float(value), int(step)))

        def add_figure(self, tag, figure, step=0):
            plt.close(figure)

        def commit(self):
            pass

        def discard(self):
            pass

        def close(self):
            pass

    return FWRecorder()




@contextlib.contextmanager
def patched_protocols(init_params, permutation_source=None):
    """Route the framework protocols' writer to a recorder, seed the
    trainer with the reference's initial adapter weights, and optionally
    inject an explicit per-epoch row order (shuffle twins)."""
    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.engine import protocols

    rec = make_fw_recorder()
    rec.trainers, rec.cfgs = [], []  # exposed for CLI-driver twins (the CLI
    # mains return None, so the trainer/config must be captured here)
    orig_writer, orig_trainer = protocols._make_writer, protocols.Trainer

    def factory(cfg, bank, writer, mesh=None):
        t = orig_trainer(cfg, bank, writer, mesh)
        if init_params:
            p = jax.tree_util.tree_map(jnp.asarray, init_params)
            t.state = t.state._replace(params=p, opt_state=t.tx.init(p))
        if permutation_source is not None:
            t.permutation_source = permutation_source
        rec.trainers.append(t)
        rec.cfgs.append(cfg)
        return t

    protocols._make_writer = lambda cfg, log_dir: rec
    protocols.Trainer = factory
    try:
        yield rec
    finally:
        protocols._make_writer, protocols.Trainer = orig_writer, orig_trainer


def max_param_diff(ref_params: Dict, fw_params) -> float:
    import jax

    ref_leaves = jax.tree_util.tree_leaves(ref_params)
    fw_leaves = jax.tree_util.tree_leaves(jax.device_get(fw_params))
    assert len(ref_leaves) == len(fw_leaves) > 0
    return max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(ref_leaves, fw_leaves)
    )
