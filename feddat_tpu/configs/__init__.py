from feddat_tpu.configs.core import (
    AdapterSpec,
    ViltModelConfig,
    AlbefBertConfig,
    AlbefModelConfig,
    OptimizerConfig,
    FederatedConfig,
    TrainConfig,
    PEFTMode,
)
from feddat_tpu.configs.tasks import (
    TASK_CONFIGS,
    CLIENT_SETS,
    TaskSpec,
    resolve_clients,
)

__all__ = [
    "AdapterSpec",
    "ViltModelConfig",
    "AlbefBertConfig",
    "AlbefModelConfig",
    "OptimizerConfig",
    "FederatedConfig",
    "TrainConfig",
    "PEFTMode",
    "TASK_CONFIGS",
    "CLIENT_SETS",
    "TaskSpec",
    "resolve_clients",
]
