from .rnn import RNNSpec, bidirectional_scan, init_bidirectional, init_rnn_params, rnn_scan
from .encoders import ENCODER_TYPES, EncoderConfig, EncoderOutput, apply_encoder, init_encoder
from .attention import ATTENTION_TYPES, AttentionConfig, attend, init_attention, precompute_keys
from .ctc import CTCConfig, CTCOutput, apply_ctc, init_ctc
from .seq2seq import Seq2SeqConfig, Seq2SeqOutput, forward_train, greedy_decode, init_seq2seq
from .lm import LMConfig, init_lm, lm_init_state, lm_prefix_logp, lm_sequence_nll, lm_step

__all__ = [
    "ATTENTION_TYPES", "AttentionConfig", "CTCConfig", "CTCOutput",
    "ENCODER_TYPES", "EncoderConfig", "EncoderOutput", "LMConfig",
    "RNNSpec", "Seq2SeqConfig", "Seq2SeqOutput", "apply_ctc",
    "apply_encoder", "attend", "bidirectional_scan", "forward_train",
    "greedy_decode", "init_attention", "init_bidirectional", "init_ctc",
    "init_encoder", "init_lm", "init_rnn_params", "init_seq2seq",
    "lm_init_state", "lm_prefix_logp", "lm_sequence_nll", "lm_step",
    "precompute_keys", "rnn_scan",
]
