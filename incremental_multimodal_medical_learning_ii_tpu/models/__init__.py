from incremental_multimodal_medical_learning_ii_tpu.models.adapters import (  # noqa: F401
    AdapterPair,
    LinearAdapter,
    MLPAdapter,
    init_adapters,
    make_adapter,
)
