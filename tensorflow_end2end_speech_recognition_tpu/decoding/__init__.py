from .ctc_greedy import ctc_greedy_decode
from .ctc_prefix_beam import ctc_prefix_beam_search
from .attention_beam import BeamSearchResult, attention_beam_search
from .joint_rescoring import joint_rescore

__all__ = [
    "BeamSearchResult",
    "attention_beam_search",
    "ctc_greedy_decode",
    "ctc_prefix_beam_search",
    "joint_rescore",
]
