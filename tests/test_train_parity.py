"""Training-dynamics parity: the jitted train step vs an independent torch
re-implementation of the reference's optimization math (image+text MLP
adapters, prompt-mean cosine logits, BCEWithLogits, Adam), from identical
initial weights over identical batches."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.data.store import EmbeddingDataset
from incremental_multimodal_medical_learning_ii_tpu.engine.steps import (
    build_train_step,
    init_train_state,
)
from incremental_multimodal_medical_learning_ii_tpu.models.adapters import AdapterPair
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import PromptBank
from incremental_multimodal_medical_learning_ii_tpu.utils.config import joint_config


class TorchAdapters(torch.nn.Module):
    def __init__(self, params):
        super().__init__()
        self.image = torch.nn.Sequential(
            torch.nn.Linear(128, 256), torch.nn.ReLU(), torch.nn.Linear(256, 128)
        )
        self.text = torch.nn.Sequential(
            torch.nn.Linear(128, 256), torch.nn.ReLU(), torch.nn.Linear(256, 128)
        )
        with torch.no_grad():
            for tower, sub in (("image", self.image), ("text", self.text)):
                sub[0].weight.copy_(torch.tensor(np.asarray(params[tower]["dense1"]["kernel"]).T))
                sub[0].bias.copy_(torch.tensor(np.asarray(params[tower]["dense1"]["bias"])))
                sub[2].weight.copy_(torch.tensor(np.asarray(params[tower]["dense2"]["kernel"]).T))
                sub[2].bias.copy_(torch.tensor(np.asarray(params[tower]["dense2"]["bias"])))


def torch_train(params, pos, neg, batches, lr, steps_labels):
    model = TorchAdapters(params)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    criterion = torch.nn.BCEWithLogitsLoss()
    pos_t = torch.tensor(pos)  # (C, P, D) raw prompt embeddings
    neg_t = torch.tensor(neg)
    losses = []
    for embs, labels in zip(batches, steps_labels):
        opt.zero_grad()
        x = model.image(torch.tensor(embs))
        logits = torch.zeros(len(embs), 5)
        for c in range(5):
            p = model.text(pos_t[c]).mean(dim=0, keepdim=True)
            n = model.text(neg_t[c]).mean(dim=0, keepdim=True)
            pos_sim = torch.nn.functional.cosine_similarity(x, p)
            neg_sim = torch.nn.functional.cosine_similarity(x, n)
            logits[:, c] = pos_sim - neg_sim
        loss = criterion(logits, torch.tensor(labels))
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return model, losses


def torch_train_with_mycl(params, pos, neg, batches, lr, steps_labels, threshold):
    """Reference myCL interplay: snapshot before each step, Adam update,
    then per-tensor |delta| min-max reset (Trainer.py:538-541, 592-594,
    1556-1587)."""
    import copy

    model = TorchAdapters(params)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    criterion = torch.nn.BCEWithLogitsLoss()
    pos_t, neg_t = torch.tensor(pos), torch.tensor(neg)
    for embs, labels in zip(batches, steps_labels):
        snapshot = copy.deepcopy(model)
        opt.zero_grad()
        x = model.image(torch.tensor(embs))
        logits = torch.zeros(len(embs), 5)
        for c in range(5):
            p = model.text(pos_t[c]).mean(dim=0, keepdim=True)
            n = model.text(neg_t[c]).mean(dim=0, keepdim=True)
            logits[:, c] = torch.nn.functional.cosine_similarity(
                x, p
            ) - torch.nn.functional.cosine_similarity(x, n)
        criterion(logits, torch.tensor(labels)).backward()
        opt.step()
        with torch.no_grad():
            for p1, p2 in zip(model.parameters(), snapshot.parameters()):
                diff = torch.abs(p1 - p2)
                cutoff = diff.min() + threshold * (diff.max() - diff.min())
                mask = diff < cutoff
                p1.data[mask] = p2.data[mask]
    return model


def test_mycl_training_matches_torch():
    """Full interplay of Adam + per-step myCL reset over several steps."""
    rng = np.random.default_rng(2)
    cfg = joint_config(batch_size=32, epochs=1, lr=1e-3, continual_learning="myCL")
    pair = AdapterPair(cfg.adapter, cfg.shared, cfg.image_adapter, cfg.text_adapter)
    params = pair.init(jax.random.PRNGKey(9))

    c, p, d = 5, 4, 128
    pos = rng.normal(size=(c, p, d)).astype(np.float32)
    neg = rng.normal(size=(c, p, d)).astype(np.float32)
    bank = PromptBank(
        pos=jnp.asarray(pos), neg=jnp.asarray(neg),
        pos_count=jnp.full(c, p, jnp.int32), neg_count=jnp.full(c, p, jnp.int32),
    )
    batches = [rng.normal(size=(32, 128)).astype(np.float32) for _ in range(4)]
    labels = [(rng.random((32, 5)) < 0.4).astype(np.float32) for _ in range(4)]
    threshold = 0.4

    t_model = torch_train_with_mycl(params, pos, neg, batches, cfg.lr, labels, threshold)

    state, tx = init_train_state(pair, params, cfg)
    step = build_train_step(pair, tx, cfg)
    elem_mask = np.ones(32, np.float32)
    class_mask = np.ones(5, np.float32)
    for embs, lbl in zip(batches, labels):
        state, metrics = step(state, embs, lbl, elem_mask, class_mask, bank, threshold)
        assert int(metrics["n_reset"]) > 0  # resets actually happen

    final = jax.device_get(state.params)
    np.testing.assert_allclose(
        final["image"]["dense1"]["kernel"],
        t_model.image[0].weight.detach().numpy().T,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        final["text"]["dense1"]["bias"],
        t_model.text[0].bias.detach().numpy(),
        atol=1e-4,
    )


@pytest.mark.slow
def test_profcl_epoch_reset_matches_torch():
    """profCL: snapshot at epoch start, train normally, reset once at epoch
    end (Trainer.py:1589-1632 + DATA_INCREMENTAL.py:81-86)."""
    import copy

    rng = np.random.default_rng(3)
    cfg = joint_config(batch_size=32, epochs=1, lr=1e-3, continual_learning="profCL")
    pair = AdapterPair(cfg.adapter, cfg.shared, cfg.image_adapter, cfg.text_adapter)
    params = pair.init(jax.random.PRNGKey(8))

    c, p, d = 5, 4, 128
    pos = rng.normal(size=(c, p, d)).astype(np.float32)
    neg = rng.normal(size=(c, p, d)).astype(np.float32)
    bank = PromptBank(
        pos=jnp.asarray(pos), neg=jnp.asarray(neg),
        pos_count=jnp.full(c, p, jnp.int32), neg_count=jnp.full(c, p, jnp.int32),
    )
    batches = [rng.normal(size=(32, 128)).astype(np.float32) for _ in range(3)]
    labels = [(rng.random((32, 5)) < 0.4).astype(np.float32) for _ in range(3)]
    threshold = 0.4

    # torch: plain Adam epoch then one reset vs the epoch-start snapshot
    t_model, _ = torch_train(params, pos, neg, batches, cfg.lr, labels)
    t_snapshot = TorchAdapters(params)
    with torch.no_grad():
        for p1, p2 in zip(t_model.parameters(), t_snapshot.parameters()):
            diff = torch.abs(p1 - p2)
            cutoff = diff.min() + threshold * (diff.max() - diff.min())
            mask = diff < cutoff
            p1.data[mask] = p2.data[mask]

    # framework: Trainer.model_copy + train + prof_incremental
    from incremental_multimodal_medical_learning_ii_tpu.engine.cl import weight_reset

    state, tx = init_train_state(pair, params, cfg)
    step = build_train_step(pair, tx, cfg)
    snapshot = jax.tree_util.tree_map(jnp.copy, state.params)
    elem_mask = np.ones(32, np.float32)
    class_mask = np.ones(5, np.float32)
    for embs, lbl in zip(batches, labels):
        state, _ = step(state, embs, lbl, elem_mask, class_mask, bank, 0.0)
    new_params, n_reset, _ = weight_reset(state.params, snapshot, threshold)
    assert int(n_reset) > 0
    final = jax.device_get(new_params)
    np.testing.assert_allclose(
        final["image"]["dense2"]["kernel"],
        t_model.image[2].weight.detach().numpy().T,
        atol=1e-4,
    )


@pytest.mark.slow
def test_train_step_matches_torch_adam():
    rng = np.random.default_rng(0)
    cfg = joint_config(batch_size=32, epochs=1, lr=1e-3)
    pair = AdapterPair(cfg.adapter, cfg.shared, cfg.image_adapter, cfg.text_adapter)
    params = pair.init(jax.random.PRNGKey(4))

    c, p, d = 5, 4, 128
    pos = rng.normal(size=(c, p, d)).astype(np.float32)
    neg = rng.normal(size=(c, p, d)).astype(np.float32)
    bank = PromptBank(
        pos=jnp.asarray(pos), neg=jnp.asarray(neg),
        pos_count=jnp.full(c, p, jnp.int32), neg_count=jnp.full(c, p, jnp.int32),
    )

    n_steps = 6
    batches = [rng.normal(size=(32, 128)).astype(np.float32) for _ in range(n_steps)]
    labels = [(rng.random((32, 5)) < 0.4).astype(np.float32) for _ in range(n_steps)]

    # --- torch reference ---
    t_model, t_losses = torch_train(params, pos, neg, batches, cfg.lr, labels)

    # --- framework ---
    state, tx = init_train_state(pair, params, cfg)
    step = build_train_step(pair, tx, cfg)
    elem_mask = np.ones(32, np.float32)
    class_mask = np.ones(5, np.float32)
    j_losses = []
    for embs, lbl in zip(batches, labels):
        state, metrics = step(state, embs, lbl, elem_mask, class_mask, bank, 0.0)
        j_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(j_losses, t_losses, atol=2e-5)
    final = jax.device_get(state.params)
    np.testing.assert_allclose(
        final["image"]["dense1"]["kernel"],
        t_model.image[0].weight.detach().numpy().T,
        atol=5e-5,
    )
    np.testing.assert_allclose(
        final["text"]["dense2"]["bias"],
        t_model.text[2].bias.detach().numpy(),
        atol=5e-5,
    )
