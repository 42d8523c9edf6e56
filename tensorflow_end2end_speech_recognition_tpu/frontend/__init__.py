from .features import (
    FrontendConfig,
    add_deltas,
    cmvn_utterance,
    extract_features,
    frame_signal,
    log_mel_spectrogram,
    num_frames,
    preemphasize,
)
from .augment import SpecAugmentConfig, spec_augment

__all__ = [
    "FrontendConfig",
    "SpecAugmentConfig",
    "add_deltas",
    "cmvn_utterance",
    "extract_features",
    "frame_signal",
    "log_mel_spectrogram",
    "num_frames",
    "preemphasize",
    "spec_augment",
]
