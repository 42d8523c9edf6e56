"""LSTM language model for shallow fusion and rescoring.

The reference's LibriSpeech-960 joint config used RNN-LM shallow fusion at
decode time (BASELINE.json config #5; Hori et al. 2017). This is a compact
functional LSTM LM over the label vocabulary with a step interface designed
for beam search: state lives in fixed-shape tensors that beam-parent gathers
can reindex.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rnn import RNNSpec, _lstm_step, init_rnn_params


class LMConfig(NamedTuple):
    vocab: int  # includes sos/eos ids of the task it fuses with
    num_units: int = 256
    embedding_dim: int = 128
    num_layers: int = 1


def init_lm(key, cfg: LMConfig, scale: float = 0.1):
    keys = jax.random.split(key, cfg.num_layers + 2)
    layers = []
    dim = cfg.embedding_dim
    spec = RNNSpec(cell="lstm", num_units=cfg.num_units)
    for i in range(cfg.num_layers):
        layers.append(init_rnn_params(keys[i], spec, dim, scale))
        dim = cfg.num_units
    return {
        "embedding": jax.random.uniform(
            keys[-2], (cfg.vocab, cfg.embedding_dim), jnp.float32, -scale, scale
        ),
        "layers": layers,
        "out": {
            "w": jax.random.uniform(keys[-1], (dim, cfg.vocab), jnp.float32, -scale, scale),
            "b": jnp.zeros((cfg.vocab,), jnp.float32),
        },
    }


def lm_init_state(cfg: LMConfig, batch: int):
    return tuple(
        (jnp.zeros((batch, cfg.num_units)), jnp.zeros((batch, cfg.num_units)))
        for _ in range(cfg.num_layers)
    )


def lm_step(params, cfg: LMConfig, state, tokens: jnp.ndarray):
    """Advance the LM by one token. Returns (new_state, logp [B, vocab])."""
    spec = RNNSpec(cell="lstm", num_units=cfg.num_units)
    x = params["embedding"][tokens]
    new_state = []
    mask = jnp.ones((tokens.shape[0], 1), bool)
    for layer_params, carry in zip(params["layers"], state):
        xproj = (
            jnp.matmul(x, layer_params["wx"], preferred_element_type=jnp.float32)
            + layer_params["b"]
        )
        carry, _ = _lstm_step(spec, layer_params, carry, xproj, mask)
        x = carry[0]
        new_state.append(carry)
    logits = jnp.matmul(x, params["out"]["w"], preferred_element_type=jnp.float32) + params["out"]["b"]
    return tuple(new_state), jax.nn.log_softmax(logits, axis=-1)


def lm_prefix_logp(params, cfg: LMConfig, prefixes: jnp.ndarray, lengths: jnp.ndarray, sos_id: int):
    """Next-token log-probs after each prefix: [B, W, L] -> [B, W, vocab].

    Runs the LM over every beam prefix from <sos> and reads the distribution
    at each prefix's length. Used by CTC prefix-beam shallow fusion (the
    attention beam carries LM state incrementally instead; this path
    recomputes because CTC prefixes are rewritten by the merge each frame).
    """
    b, w, l = prefixes.shape
    flat = prefixes.reshape(b * w, l)
    flat_len = lengths.reshape(b * w)
    inputs = jnp.concatenate(
        [jnp.full((b * w, 1), sos_id, flat.dtype), jnp.where(flat >= 0, flat, 0)],
        axis=1,
    )

    def body(state, tok):
        state, logp = lm_step(params, cfg, state, tok)
        return state, logp

    _, logps = jax.lax.scan(body, lm_init_state(cfg, b * w), inputs.swapaxes(0, 1))
    logps = logps.swapaxes(0, 1)  # [BW, L+1, V]
    out = jnp.take_along_axis(logps, flat_len[:, None, None], axis=1)[:, 0]
    return out.reshape(b, w, cfg.vocab)


def make_fusion_lm(params, cfg: LMConfig, sos_id: int, num_ctc_classes: int):
    """Carried-state shallow-fusion adapter for the CTC prefix beam.

    Maps the LM vocabulary (task units + <sos>/<eos>) onto the CTC class
    space (units + trailing blank): unit columns align, the blank column
    scores 0 (blanks never extend a prefix, so it is never read). Returns a
    ``decoding.ctc_prefix_beam.FusionLM`` whose state leaves are [B, W, H],
    advanced once per accepted token — O(T) LM steps per utterance instead
    of the O(T·L) full-prefix recompute of ``lm_prefix_logp``.
    """
    from ..decoding.ctc_prefix_beam import FusionLM

    def _map_vocab(logp_flat, b, w):  # [B*W, V] -> [B, W, C_ctc]
        units = logp_flat[:, : num_ctc_classes - 1]
        blank = jnp.zeros_like(units[:, :1])
        return jnp.concatenate([units, blank], axis=-1).reshape(b, w, num_ctc_classes)

    def _flatten(state, b, w):
        return jax.tree.map(lambda v: v.reshape((b * w,) + v.shape[2:]), state)

    def _unflatten(state, b, w):
        return jax.tree.map(lambda v: v.reshape((b, w) + v.shape[1:]), state)

    def init(b, w):
        state = lm_init_state(cfg, b * w)
        state, logp = lm_step(params, cfg, state, jnp.full((b * w,), sos_id, jnp.int32))
        return _unflatten(state, b, w), _map_vocab(logp, b, w)

    def step(state, tokens):  # tokens [B, W]
        b, w = tokens.shape
        state, logp = lm_step(params, cfg, _flatten(state, b, w), tokens.reshape(b * w))
        return _unflatten(state, b, w), _map_vocab(logp, b, w)

    return FusionLM(init=init, step=step)


def lm_sequence_nll(params, cfg: LMConfig, tokens: jnp.ndarray, lengths: jnp.ndarray,
                    sos_id: int, eos_id: int | None = None):
    """Teacher-forced NLL per sequence incl. the ``<eos>`` step, [B].

    Targets are ``l1..lU, <eos>`` under inputs ``<sos>, l1..lU`` — the
    ``<eos>`` step MUST be supervised: shallow fusion adds the LM's log-prob
    over the full vocabulary including the eos column
    (``decoding/attention_beam.py``), so an LM that never saw eos as a
    target drives p(eos) to ~0 and systematically penalizes hypothesis
    termination (over-long outputs growing with lm_weight); sequence
    rescoring would be length-biased the same way.
    """
    if eos_id is None:
        eos_id = sos_id + 1  # task convention: sos = vocab-2, eos = vocab-1
    b, u = tokens.shape
    safe = jnp.where(tokens >= 0, tokens, 0)
    inputs = jnp.concatenate(
        [jnp.full((b, 1), sos_id, tokens.dtype), safe], axis=1
    )  # [B, U+1]

    def body(state, tok):
        state, logp = lm_step(params, cfg, state, tok)
        return state, logp

    _, logps = jax.lax.scan(body, lm_init_state(cfg, b), inputs.swapaxes(0, 1))
    logps = logps.swapaxes(0, 1)  # [B, U+1, V]
    idx = jnp.arange(u + 1)[None, :]
    tgt = jnp.where(
        idx < lengths[:, None],
        jnp.pad(safe, ((0, 0), (0, 1))),
        jnp.asarray(eos_id, tokens.dtype),
    )
    nll = -jnp.take_along_axis(logps, tgt[..., None], axis=-1)[..., 0]
    mask = (idx <= lengths[:, None]).astype(jnp.float32)  # incl. the eos step
    return jnp.sum(nll * mask, axis=-1)
