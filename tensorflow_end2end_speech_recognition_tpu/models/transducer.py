"""RNN-Transducer model: encoder + prediction network + additive joint.

A TPU-first extension beyond the reference's model zoo (SURVEY.md §2 stops
at CTC / attention / joint CTC-attention): the transducer is the standard
streaming E2E architecture — frame-synchronous like CTC, but with an
autoregressive label model (the prediction network), so it removes CTC's
conditional-independence assumption while staying causal end to end. It
reuses this framework's pieces wholesale: any encoder from the zoo
(causal LSTM for streaming, conformer/BLSTM offline), the fused-gate LSTM
scan as the prediction network, and ``ops/transducer.py``'s lattice loss
(associative-scan wavefront, no [B,T,U,V] materialization).

Blank takes the LAST class index (``blank_id == num_classes``), the same
convention as ``models/ctc.py``; blank doubles as the SOS token feeding
the prediction network's first step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .encoders import EncoderConfig, apply_encoder, init_encoder
from .rnn import RNNSpec, dropout, init_rnn_params, rnn_scan


class TransducerConfig(NamedTuple):
    encoder: EncoderConfig
    num_classes: int
    pred_num_units: int = 256
    pred_num_layers: int = 1
    embedding_dim: int = 128
    joint_dim: int = 256
    parameter_init: float = 0.1
    pred_dropout_keep_prob: float = 1.0
    # greedy decode: symbols allowed per encoder frame before forcing blank
    max_symbols_per_frame: int = 4

    @property
    def vocab_with_blank(self) -> int:
        return self.num_classes + 1

    @property
    def blank_id(self) -> int:
        return self.num_classes

    def pred_spec(self) -> RNNSpec:
        # the prediction net must be steppable for decode: scan impl always
        # (the Pallas layer kernel assumes zero initial state)
        return RNNSpec(cell="lstm", num_units=self.pred_num_units, impl="scan")


class TransducerOutput(NamedTuple):
    f_proj: jnp.ndarray  # [B, T', J] encoder contribution to the joint
    enc_len: jnp.ndarray  # [B]
    aux_loss: jnp.ndarray | None = None  # MoE load-balance loss (weighted)


def _affine_init(key, din, dout, scale):
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (din, dout), jnp.float32, -scale, scale),
        "b": jnp.zeros((dout,), jnp.float32),
    }


def _affine(p, x):
    return jnp.matmul(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def init_transducer(key, cfg: TransducerConfig, input_dim: int):
    kenc, kemb, kpred, kep, kpp, kout = jax.random.split(key, 6)
    s = cfg.parameter_init
    spec = cfg.pred_spec()
    pred = []
    dim = cfg.embedding_dim
    for k in jax.random.split(kpred, cfg.pred_num_layers):
        pred.append(init_rnn_params(k, spec, dim, s))
        dim = spec.out_dim
    return {
        "encoder": init_encoder(kenc, cfg.encoder, input_dim),
        "embed": jax.random.uniform(
            kemb, (cfg.vocab_with_blank, cfg.embedding_dim), jnp.float32, -s, s
        ),
        "pred": pred,
        "enc_proj": _affine_init(kep, cfg.encoder.output_dim, cfg.joint_dim, s),
        "pred_proj": _affine_init(kpp, cfg.pred_num_units, cfg.joint_dim, s),
        "out": _affine_init(kout, cfg.joint_dim, cfg.vocab_with_blank, s),
    }


def encode(params, cfg: TransducerConfig, feats, feat_len, train=False, rng=None):
    """Features -> joint-space encoder activations [B, T', J]."""
    enc = apply_encoder(params["encoder"], cfg.encoder, feats, feat_len,
                        train=train, rng=rng)
    return TransducerOutput(
        _affine(params["enc_proj"], enc.outputs), enc.lengths, enc.aux_loss
    )


def predict(params, cfg: TransducerConfig, tokens, initial_states=None,
            train=False, rng=None):
    """Prediction network over a token sequence.

    tokens: [B, U'] int32 (use ``blank_id`` as SOS / padding — the lattice
    loss masks rows past each utterance's label length, decode steps one
    token at a time). Returns (g_proj [B, U', J], final_states) where
    final_states is a list of per-layer (h, c) for streaming/decode carry.
    """
    b, u = tokens.shape
    x = params["embed"][tokens]  # [B, U', E]
    if train and rng is not None:
        rng, k = jax.random.split(rng)
        x = dropout(k, x, cfg.pred_dropout_keep_prob, train)
    spec = cfg.pred_spec()
    lengths = jnp.full((b,), u, jnp.int32)
    states = []
    for li, p in enumerate(params["pred"]):
        init = initial_states[li] if initial_states is not None else None
        x, fin = rnn_scan(p, spec, x, lengths, initial_state=init)
        states.append(fin)
        if train and rng is not None:
            rng, k = jax.random.split(rng)
            x = dropout(k, x, cfg.pred_dropout_keep_prob, train)
    return _affine(params["pred_proj"], x), states


def pred_initial_states(cfg: TransducerConfig, batch_size: int):
    h = cfg.pred_num_units
    return [
        (jnp.zeros((batch_size, h)), jnp.zeros((batch_size, h)))
        for _ in range(cfg.pred_num_layers)
    ]


def joint_logits(params, f_t, g_u):
    """One lattice node's logits: tanh(f + g) @ W_out. f_t/g_u: [..., J]."""
    z = jnp.tanh(f_t + g_u)
    return _affine(params["out"], z)
