from .config import ExperimentConfig
from .edit_distance import compute_cer, compute_per, compute_wer, wer_align
from .metrics import evaluate_ctc, score_pair

__all__ = [
    "ExperimentConfig",
    "compute_cer",
    "compute_per",
    "compute_wer",
    "evaluate_ctc",
    "score_pair",
    "wer_align",
]
