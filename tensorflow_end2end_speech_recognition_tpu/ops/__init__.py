from .ctc import ctc_loss, ctc_posteriors
from .losses import joint_loss, l2_weight_decay, smoothed_cross_entropy

__all__ = [
    "ctc_loss",
    "ctc_posteriors",
    "joint_loss",
    "l2_weight_decay",
    "smoothed_cross_entropy",
]
