from .checkpoint import CheckpointManager
from .loop import MODEL_TYPES, build_corpus_splits, build_task, fit
from .lr_controller import LRController
from .optimizer import OPTIMIZERS, apply_updates, build_optimizer

__all__ = [
    "CheckpointManager",
    "LRController",
    "MODEL_TYPES",
    "OPTIMIZERS",
    "apply_updates",
    "build_corpus_splits",
    "build_optimizer",
    "build_task",
    "fit",
]
