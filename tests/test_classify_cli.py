import numpy as np
import torch
from PIL import Image


import pytest

pytestmark = pytest.mark.slow


def test_classify_cli_with_adapter_checkpoint(tmp_path, capsys, rng):
    import sys

    sys.path.insert(0, "tests")
    from torch_biovil_fixture import TorchBioViLImage

    # BioViL checkpoint in the reference's state-dict layout
    torch.manual_seed(0)
    model = TorchBioViLImage()
    ckpt = tmp_path / "biovil.pt"
    torch.save(model.state_dict(), ckpt)

    # trained-adapter checkpoint
    from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
    from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import save_checkpoint
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
        joint_config,
    )

    cfg = joint_config(batch_size=64, epochs=1)
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    trainer = Trainer(cfg, bank)
    trainer.train(synthetic_dataset(128), epoch=1)
    save_checkpoint(tmp_path / "run", trainer.state)

    imgs = []
    for i in range(2):
        path = tmp_path / f"cxr{i}.png"
        Image.fromarray((rng.random((120, 100)) * 255).astype(np.uint8), "L").save(path)
        imgs.append(str(path))

    from incremental_multimodal_medical_learning_ii_tpu.cli.classify import main

    main(imgs + [
        "--biovil-checkpoint", str(ckpt),
        "--adapter-checkpoint", str(tmp_path / "run"),
        "--batch-size", "2",
    ])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith(str(tmp_path))]
    assert len(lines) == 2
    scores = [float(v) for v in lines[0].split(",")[1:]]
    assert len(scores) == 5
    assert all(0 <= s <= 1 for s in scores)


def test_classify_cli_with_reference_adapters(tmp_path, capsys, rng):
    import sys
    import types

    import torch.nn as nn

    sys.path.insert(0, "tests")
    from torch_biovil_fixture import TorchBioViLImage

    torch.manual_seed(1)
    ckpt = tmp_path / "biovil.pt"
    torch.save(TorchBioViLImage().state_dict(), ckpt)

    # reference-style pickled adapter modules
    stub = types.ModuleType("models")

    class myMLP(nn.Module):  # noqa: N801
        def __init__(self):
            super().__init__()
            self.layer = nn.Sequential(nn.Linear(128, 256), nn.ReLU(), nn.Linear(256, 128))

    myMLP.__module__ = "models"
    myMLP.__qualname__ = "myMLP"
    stub.myMLP = myMLP
    sys.modules["models"] = stub
    torch.save(myMLP(), tmp_path / "image_adapter.pt")
    torch.save(myMLP(), tmp_path / "text_adapter.pt")
    sys.modules.pop("models", None)

    img = tmp_path / "cxr.png"
    Image.fromarray((rng.random((110, 90)) * 255).astype(np.uint8), "L").save(img)

    from incremental_multimodal_medical_learning_ii_tpu.cli.classify import main

    main([
        str(img),
        "--biovil-checkpoint", str(ckpt),
        "--reference-image-adapter", str(tmp_path / "image_adapter.pt"),
        "--reference-text-adapter", str(tmp_path / "text_adapter.pt"),
        "--batch-size", "1",
    ])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith(str(img))]
    assert len(lines) == 1


def test_classify_cli_sgd_checkpoint_fallback(tmp_path, capsys, rng):
    """An SGD-trained TrainState serves without --optim (the restore falls
    back to the other optimizer's template; only .params are used)."""
    from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
    from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import save_checkpoint
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
        joint_config,
    )

    cfg = joint_config(batch_size=64, epochs=1, optim="sgd", lr=0.1)
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    trainer = Trainer(cfg, bank)
    trainer.train(synthetic_dataset(128), epoch=1)
    save_checkpoint(tmp_path / "run", trainer.state)

    path = tmp_path / "cxr.png"
    Image.fromarray((rng.random((120, 100)) * 255).astype(np.uint8), "L").save(path)

    from incremental_multimodal_medical_learning_ii_tpu.cli.classify import main

    # default --optim adam: must fall back, not crash
    main([str(path), "--random-weights",
          "--adapter-checkpoint", str(tmp_path / "run"), "--batch-size", "1"])
    out = capsys.readouterr().out
    assert "sgd opt-state template" in out
    line = [l for l in out.splitlines() if l.startswith(str(path))]
    assert len(line) == 1 and len(line[0].split(",")) == 6

    # explicit --optim sgd: restores directly, no fallback note
    main([str(path), "--random-weights",
          "--adapter-checkpoint", str(tmp_path / "run"), "--batch-size", "1",
          "--optim", "sgd"])
    out = capsys.readouterr().out
    assert "opt-state template" not in out


def test_classify_cli_single_adapter_checkpoint(tmp_path, capsys, rng):
    """A checkpoint trained with only an image adapter (--no-text-adapter, a
    supported/twinned training config) must be servable: the restore
    template's tree has to match the single-adapter checkpoint."""
    from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
    from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import save_checkpoint
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
        joint_config,
    )

    cfg = joint_config(batch_size=64, epochs=1, text_adapter=False)
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    trainer = Trainer(cfg, bank)
    trainer.train(synthetic_dataset(128), epoch=1)
    assert set(trainer.state.params) == {"image"}
    save_checkpoint(tmp_path / "run", trainer.state)

    from PIL import Image

    path = tmp_path / "cxr.png"
    Image.fromarray((rng.random((120, 100)) * 255).astype(np.uint8), "L").save(path)

    from incremental_multimodal_medical_learning_ii_tpu.cli.classify import main

    main([str(path), "--random-weights",
          "--adapter-checkpoint", str(tmp_path / "run"),
          "--no-text-adapter", "--batch-size", "1"])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith(str(path))]
    assert len(lines) == 1 and len(lines[0].split(",")) == 6


def test_build_bank_rejects_half_specified_checkpoint_pair(tmp_path):
    """--cxr-bert-checkpoint without --cxr-bert-vocab must fail loudly, not
    silently serve a synthetic random bank."""
    import argparse

    from incremental_multimodal_medical_learning_ii_tpu.cli.common import build_bank
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        ExperimentConfig,
    )

    cfg = ExperimentConfig(mode="joint", epochs=1)
    args = argparse.Namespace(
        cxr_bert_snapshot=None, cxr_bert_checkpoint="missing.pt", cxr_bert_vocab=None,
    )
    with pytest.raises(SystemExit, match="go together"):
        build_bank(args, cfg)
    args = argparse.Namespace(
        cxr_bert_snapshot=None, cxr_bert_checkpoint=None, cxr_bert_vocab="vocab.txt",
    )
    with pytest.raises(SystemExit, match="go together"):
        build_bank(args, cfg)
