"""torch -> JAX weight converters for the two BioViL towers.

* :func:`convert_biovil_image_state_dict` consumes the reference image
  checkpoint layout (``biovil_image_resnet50_proj_size_128.pt`` loaded into
  ``ImageModel``, keys ``encoder.encoder.*`` for the ResNet trunk and
  ``projector.model.*`` for the 1x1-conv MLP,
  ``health_multimodal/image/model/model.py:95-118``).
* :func:`convert_cxr_bert_state_dict` consumes a HuggingFace
  ``BertForMaskedLM`` state dict plus the CXR-BERT ``cls_projection_head``
  (``modelling_cxrbert.py:64-68``).

Transpositions: torch conv OIHW -> HWIO; torch Linear (out,in) -> (in,out).
Inputs are ``state_dict()``-style mappings of numpy arrays or torch tensors.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import BertDims
from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
    RESNET18_LAYERS,
    RESNET50_LAYERS,
)

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv(sd: Mapping, key: str) -> Params:
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}  # OIHW -> HWIO


def _bn(sd: Mapping, prefix: str) -> Params:
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }


def _linear(sd: Mapping, prefix: str) -> Params:
    return {
        "kernel": _np(sd[prefix + ".weight"]).T,  # (out,in) -> (in,out)
        "bias": _np(sd[prefix + ".bias"]),
    }


def _ln(sd: Mapping, prefix: str) -> Params:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


# ----------------------------------------------------------------------
# BioViL image model
# ----------------------------------------------------------------------
def convert_resnet50_state_dict(sd: Mapping, prefix: str = "") -> Params:
    """torchvision ResNet-50 state dict (optionally under ``prefix``)."""
    p = prefix
    params: Params = {"conv1": _conv(sd, p + "conv1.weight"), "bn1": _bn(sd, p + "bn1")}
    for li, blocks in enumerate(RESNET50_LAYERS, start=1):
        layer = []
        for bi in range(blocks):
            bp = f"{p}layer{li}.{bi}."
            block: Params = {
                "conv1": _conv(sd, bp + "conv1.weight"),
                "bn1": _bn(sd, bp + "bn1"),
                "conv2": _conv(sd, bp + "conv2.weight"),
                "bn2": _bn(sd, bp + "bn2"),
                "conv3": _conv(sd, bp + "conv3.weight"),
                "bn3": _bn(sd, bp + "bn3"),
            }
            if bp + "downsample.0.weight" in sd:
                block["downsample_conv"] = _conv(sd, bp + "downsample.0.weight")
                block["downsample_bn"] = _bn(sd, bp + "downsample.1")
            layer.append(block)
        params[f"layer{li}"] = layer
    return params


def convert_resnet18_state_dict(sd: Mapping, prefix: str = "") -> Params:
    """torchvision ResNet-18 (BasicBlock) state dict."""
    p = prefix
    params: Params = {"conv1": _conv(sd, p + "conv1.weight"), "bn1": _bn(sd, p + "bn1")}
    for li, blocks in enumerate(RESNET18_LAYERS, start=1):
        layer = []
        for bi in range(blocks):
            bp = f"{p}layer{li}.{bi}."
            block: Params = {
                "conv1": _conv(sd, bp + "conv1.weight"),
                "bn1": _bn(sd, bp + "bn1"),
                "conv2": _conv(sd, bp + "conv2.weight"),
                "bn2": _bn(sd, bp + "bn2"),
            }
            if bp + "downsample.0.weight" in sd:
                block["downsample_conv"] = _conv(sd, bp + "downsample.0.weight")
                block["downsample_bn"] = _bn(sd, bp + "downsample.1")
            layer.append(block)
        params[f"layer{li}"] = layer
    return params


def convert_biovil_image_state_dict(sd: Mapping) -> Params:
    """Full ImageModel: trunk under ``encoder.encoder.``, projector under
    ``projector.model.{0,1,3}`` (Sequential conv,bn,relu,conv)."""
    proj2 = _conv(sd, "projector.model.3.weight")
    proj2["bias"] = _np(sd["projector.model.3.bias"])
    return {
        "encoder": convert_resnet50_state_dict(sd, prefix="encoder.encoder."),
        "projector": {
            "conv1": _conv(sd, "projector.model.0.weight"),
            "bn": _bn(sd, "projector.model.1"),
            "conv2": proj2,
        },
    }


def load_biovil_image_checkpoint(path: str) -> Params:
    """Load the reference's ``biovil_image_resnet50_proj_size_128.pt``."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_biovil_image_state_dict(sd)


# ----------------------------------------------------------------------
# CXR-BERT
# ----------------------------------------------------------------------
def infer_bert_dims(sd: Mapping, projection_size: int = 128) -> BertDims:
    # shape reads only: torch tensors and numpy arrays both expose .shape
    # without a copy (the word-embedding table alone is ~90 MB fp32 —
    # detaching it just to read its shape is real time on a 1-vCPU host)
    word = sd["bert.embeddings.word_embeddings.weight"].shape
    pos = sd["bert.embeddings.position_embeddings.weight"].shape
    tt = sd["bert.embeddings.token_type_embeddings.weight"].shape
    inter = sd["bert.encoder.layer.0.intermediate.dense.weight"].shape
    n_layers = 0
    while f"bert.encoder.layer.{n_layers}.attention.self.query.weight" in sd:
        n_layers += 1
    hidden = int(word[1])
    # heads: standard BERT uses head_dim 64
    num_heads = max(1, hidden // 64)
    if "cls_projection_head.dense_to_hidden.weight" in sd:
        projection_size = int(sd["cls_projection_head.dense_to_hidden.weight"].shape[0])
    return BertDims(
        vocab_size=int(word[0]),
        hidden_size=hidden,
        num_layers=n_layers,
        num_heads=num_heads,
        intermediate_size=int(inter[0]),
        max_position_embeddings=int(pos[0]),
        type_vocab_size=int(tt[0]),
        projection_size=projection_size,
    )


def convert_cxr_bert_state_dict(sd: Mapping, num_heads: int | None = None) -> tuple[Params, BertDims]:
    dims = infer_bert_dims(sd)
    if num_heads is not None:
        dims = BertDims(**{**dims.__dict__, "num_heads": num_heads})
    params: Params = {
        "embeddings": {
            "word": _np(sd["bert.embeddings.word_embeddings.weight"]),
            "position": _np(sd["bert.embeddings.position_embeddings.weight"]),
            "token_type": _np(sd["bert.embeddings.token_type_embeddings.weight"]),
            "ln": _ln(sd, "bert.embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for li in range(dims.num_layers):
        lp = f"bert.encoder.layer.{li}."
        params["layers"].append(
            {
                "q": _linear(sd, lp + "attention.self.query"),
                "k": _linear(sd, lp + "attention.self.key"),
                "v": _linear(sd, lp + "attention.self.value"),
                "attn_out": _linear(sd, lp + "attention.output.dense"),
                "attn_ln": _ln(sd, lp + "attention.output.LayerNorm"),
                "ffn_in": _linear(sd, lp + "intermediate.dense"),
                "ffn_out": _linear(sd, lp + "output.dense"),
                "ffn_ln": _ln(sd, lp + "output.LayerNorm"),
            }
        )
    decoder_bias_key = (
        "cls.predictions.decoder.bias" if "cls.predictions.decoder.bias" in sd else "cls.predictions.bias"
    )
    params["mlm_head"] = {
        "transform_dense": _linear(sd, "cls.predictions.transform.dense"),
        "transform_ln": _ln(sd, "cls.predictions.transform.LayerNorm"),
        "decoder_bias": _np(sd[decoder_bias_key]),
    }
    if "cls_projection_head.dense_to_hidden.weight" in sd:
        params["cls_projection"] = {
            "dense_to_hidden": _linear(sd, "cls_projection_head.dense_to_hidden"),
            "ln": _ln(sd, "cls_projection_head.LayerNorm"),
            "dense_to_output": _linear(sd, "cls_projection_head.dense_to_output"),
        }
    return params, dims


def load_cxr_bert_checkpoint(path_or_name: str, num_heads: int | None = None):
    """Load CXR-BERT weights from a raw torch state-dict file.  Prefer
    :func:`load_cxr_bert_snapshot` for HF snapshot directories — it reads
    the exact dims (incl. ``num_attention_heads``) from ``config.json``
    instead of relying on the head-dim-64 heuristic."""
    import torch

    sd = torch.load(path_or_name, map_location="cpu", weights_only=True)
    return convert_cxr_bert_state_dict(sd, num_heads=num_heads)


def _load_snapshot_state_dict(directory):
    """Read the weights file of an HF snapshot dir: ``model.safetensors``
    preferred, ``pytorch_model.bin`` fallback."""
    st = directory / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return load_file(str(st))
    bin_path = directory / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin in {directory}"
    )


def load_cxr_bert_snapshot(snapshot_dir):
    """Load CXR-BERT from a local HF snapshot directory.

    This consumes exactly what the reference's hub download materialises
    (``CXRBertModel.from_pretrained('microsoft/BiomedVLP-CXR-BERT-specialized',
    revision='v1.1')``, ``health_multimodal/text/utils.py:16-25``): the
    ``config.json`` supplies authoritative dims — in particular
    ``num_attention_heads``, which cannot be inferred from tensor shapes —
    the weights come from ``model.safetensors`` / ``pytorch_model.bin``, and
    ``vocab.txt`` (when present) builds the prompt tokenizer.

    Returns ``(params, dims, tokenizer_or_None)``.  Raises if the config's
    dims contradict the tensors actually found in the weights file.
    """
    import json
    from pathlib import Path

    d = Path(snapshot_dir)
    cfg = json.loads((d / "config.json").read_text())
    sd = _load_snapshot_state_dict(d)
    params, inferred = convert_cxr_bert_state_dict(
        sd, num_heads=int(cfg["num_attention_heads"])
    )
    dims = BertDims(
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        num_layers=int(cfg["num_hidden_layers"]),
        num_heads=int(cfg["num_attention_heads"]),
        intermediate_size=int(cfg["intermediate_size"]),
        max_position_embeddings=int(cfg["max_position_embeddings"]),
        type_vocab_size=int(cfg.get("type_vocab_size", 2)),
        projection_size=int(cfg.get("projection_size", inferred.projection_size)),
    )
    for field in (
        "vocab_size", "hidden_size", "num_layers", "intermediate_size",
        "max_position_embeddings", "type_vocab_size",
    ):
        if getattr(inferred, field) != getattr(dims, field):
            raise ValueError(
                f"config.json says {field}={getattr(dims, field)} but the "
                f"weights imply {getattr(inferred, field)}"
            )
    if dims.hidden_size % dims.num_heads != 0:
        raise ValueError(
            f"hidden_size {dims.hidden_size} not divisible by "
            f"num_attention_heads {dims.num_heads}"
        )
    tokenizer = None
    vocab = d / "vocab.txt"
    if vocab.exists():
        from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
            PromptTokenizer,
        )

        # honor the snapshot's tokenizer_config.json like the reference's
        # CXRBertTokenizer.from_pretrained does — a non-default
        # do_lower_case/strip_accents would otherwise silently tokenize
        # every prompt differently from the reference
        tok_kwargs = {}
        tok_cfg_path = d / "tokenizer_config.json"
        if tok_cfg_path.exists():
            raw = json.loads(tok_cfg_path.read_text())
            allowed = {
                "do_lower_case", "do_basic_tokenize", "never_split",
                "unk_token", "sep_token", "pad_token", "cls_token",
                "mask_token", "tokenize_chinese_chars", "strip_accents",
            }
            for k, v in raw.items():
                if k in allowed:
                    # newer HF formats serialize special tokens as
                    # AddedToken dicts {"content": "...", ...}
                    tok_kwargs[k] = v["content"] if isinstance(v, dict) else v
        tokenizer = PromptTokenizer(
            vocab, max_allowed_input_length=dims.max_position_embeddings,
            **tok_kwargs,
        )
    return params, dims, tokenizer


# ----------------------------------------------------------------------
# Reference adapter checkpoints
# ----------------------------------------------------------------------
import contextlib


@contextlib.contextmanager
def reference_models_stub():
    """Make the reference's pickled class paths (``models.myMLP`` /
    ``models.myLinearModel``, recorded by its whole-module
    ``torch.save(self.image_adapter, ...)``, Trainer.py:1643-1648)
    importable for the duration of a ``torch.load`` — WITHOUT leaking a
    stub into ``sys.modules``, where it would shadow any real ``models``
    module imported later in the same process (e.g. the reference's own,
    whose adapter instances must stay picklable by its save path).  A
    pre-existing ``models`` module is left untouched and used as-is."""
    import sys
    import types

    import torch.nn as nn

    if "models" in sys.modules:
        yield
        return
    stub = types.ModuleType("models")

    class myMLP(nn.Module):  # noqa: N801 - pickled class name
        def __init__(self):
            super().__init__()
            self.layer = nn.Sequential(nn.Linear(128, 256), nn.ReLU(), nn.Linear(256, 128))

        def forward(self, x):  # models.py:12-14
            return self.layer(x)

    class myLinearModel(nn.Module):  # noqa: N801
        def __init__(self):
            super().__init__()
            self.layer = nn.Sequential(nn.Linear(128, 128))

        def forward(self, x):  # models.py:23-25
            return self.layer(x)

    stub.myMLP = myMLP
    stub.myLinearModel = myLinearModel
    sys.modules["models"] = stub
    try:
        yield
    finally:
        sys.modules.pop("models", None)


def load_reference_adapter(path: str) -> Params:
    """Load a reference ``{image,text}_adapter.pt`` into adapter params.

    The reference saves WHOLE torch modules (``torch.save(self.image_adapter,
    ...)``, Trainer.py:1643-1648), so unpickling needs the ``models.myMLP`` /
    ``models.myLinearModel`` classes importable.  We register lightweight
    stand-ins under a ``models`` module (matching the pickled class paths and
    parameter names) so the 150+ checkpoints under the reference's
    ``NUOVI_RISULTATI*/`` run dirs can migrate directly.

    Returns ``{"dense1": {...}}`` (linear) or ``{"dense1", "dense2"}`` (mlp)
    in this framework's adapter layout.
    """
    import torch

    with reference_models_stub():
        module = torch.load(path, map_location="cpu", weights_only=False)
    sd = module.state_dict()
    params: Params = {"dense1": _linear(sd, "layer.0")}
    if "layer.2.weight" in sd:
        params["dense2"] = _linear(sd, "layer.2")
    return params


# ----------------------------------------------------------------------
# Diagnostics
# ----------------------------------------------------------------------
def compare_params(a: Params, b: Params, atol: float = 0.0, verbose: bool = True):
    """Leaf-by-leaf pytree comparison (the ``Trainer.compare_models``
    state-dict diff, ``Trainer.py:1287-1300``). Returns the list of
    mismatched key paths; prints a summary when verbose."""
    import jax

    mismatched = []
    leaves_a = jax.tree_util.tree_flatten_with_path(a)[0]
    leaves_b = jax.tree_util.tree_flatten_with_path(b)[0]
    if len(leaves_a) != len(leaves_b):
        raise ValueError(f"different structures: {len(leaves_a)} vs {len(leaves_b)} leaves")
    for (path_a, va), (path_b, vb) in zip(leaves_a, leaves_b):
        if path_a != path_b:
            raise ValueError(f"key mismatch: {path_a} vs {path_b}")
        va, vb = np.asarray(va), np.asarray(vb)
        if va.shape != vb.shape or not np.allclose(va, vb, atol=atol, rtol=0):
            mismatched.append(jax.tree_util.keystr(path_a))
            if verbose:
                print("Mismatch found at", jax.tree_util.keystr(path_a))
    if verbose and not mismatched:
        print("Params match perfectly! :)")
    return mismatched


def encoder_output_dim(forward_fn, params, input_hw: int = 32) -> int:
    """Probe a trunk's output feature size with a dummy forward
    (``get_encoder_output_dim``, model.py:231-247)."""
    import jax.numpy as jnp

    out = forward_fn(params, jnp.zeros((1, input_hw, input_hw, 3), jnp.float32))
    return int(out.shape[-1])
