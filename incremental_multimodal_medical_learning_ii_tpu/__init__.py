"""TPU-native incremental multimodal medical learning framework.

A from-scratch JAX / Flax / Pallas rebuild of the capabilities of
``marcomistretta/incremental_multimodal_medical_learning_II``: the BioViL
vision-language stack (ResNet-50 image encoder, CXR-BERT text encoder,
128-d joint latent space), CheXpert embedding extraction at scale, the
prompt-ensemble cosine-similarity classifier, and the zero-shot / joint /
data-incremental / class-incremental adapter-training protocols with the
myCL/profCL continual-learning weight-reset mechanism.

Design notes (TPU-first, not a port):
  * All compute paths are pure jitted functions over static shapes.
  * Text-prompt embeddings are computed once by CXR-BERT and cached in HBM
    as a padded ``PromptBank``; the (trainable) text adapter is applied to
    the cached raw embeddings *inside* the train step, which preserves the
    reference math (BERT is no-grad there; reference
    ``Trainer.py:1657-1680``) while removing the reference's
    per-class-per-batch BERT forward entirely.
  * Data parallelism is a 1-D ``jax.sharding.Mesh`` over ICI; metric
    reductions ride XLA collectives, never the host.
"""

__version__ = "0.1.0"

from incremental_multimodal_medical_learning_ii_tpu.utils.config import (  # noqa: F401
    AdapterKind,
    CHEXPERT_COMPETITION_TASKS,
    ContinualLearning,
    ExperimentConfig,
    PromptMode,
    class_incremental_config,
    data_incremental_config,
    joint_config,
    zero_shot_config,
)


def __getattr__(name):  # lazy heavyweight imports
    if name == "Trainer":
        from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer

        return Trainer
    if name in ("run_zero_joint", "run_data_incremental", "run_class_incremental", "DataBundle"):
        from incremental_multimodal_medical_learning_ii_tpu.engine import protocols

        return getattr(protocols, name)
    if name == "extract_embeddings":
        from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
            extract_embeddings,
        )

        return extract_embeddings
    if name == "EmbeddingDataset":
        from incremental_multimodal_medical_learning_ii_tpu.data.store import EmbeddingDataset

        return EmbeddingDataset
    if name == "PromptBank":
        from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import PromptBank

        return PromptBank
    raise AttributeError(name)
