"""On-device RNN-T beam search (time-synchronous, batched, static shapes).

Per encoder frame, the beam alternates label expansion and blank
commitment for up to ``max_symbols`` rounds (the same per-frame budget as
greedy):

- every live hypothesis proposes ``V`` label extensions (score +=
  ``lp[k]``, prediction net advances) and one blank commitment (score +=
  ``lp[blank]``, hypothesis freezes until the next frame);
- blank-committed candidates merge into the next frame's pool by running
  top-W; label extensions keep the top-W live set for the next round.

All of it is ``lax.scan`` over frames with a fixed inner round unroll —
tensors [B, W, ...] throughout, parent prediction-states gathered per
round with ``take_along_axis`` (the same beam-parent-gather idiom as
``attention_beam.py``). Identical-prefix merging is intentionally NOT done
(unlike the CTC prefix beam, where distinct alignments genuinely collapse
to one prefix): a transducer hypothesis's score is its own alignment path,
and the standard time-synchronous search (torchaudio, ESPnet default)
keeps alignments distinct too.

The search is strictly more thorough than greedy: greedy commits the first
frame-argmax blank, while the beam scores every (label-run + blank)
termination per frame and keeps the best W — so the top beam hypothesis's
path score is >= the greedy path's score (tests assert it).

RNN-LM shallow fusion (optional): pass a ``FusionLM`` (the same
carried-state adapter the CTC prefix beam uses —
``models.lm.make_fusion_lm`` with ``num_ctc_classes=cfg.vocab_with_blank``;
unit columns align because both layouts put blank LAST) and a
``lm_weight``. Label expansions then score
``lp[k] + lm_weight * lm_logp[k]``; blank commitments take no LM term
(blank is an alignment event, not a token — standard transducer fusion).
The LM state rides the beam dict as [B, W, H] leaves, gathered by beam
parent and advanced once per accepted label — so it carries across
streaming chunks exactly like the rest of the beam state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.transducer import (
    TransducerConfig,
    joint_logits,
    pred_initial_states,
    predict,
)

_NEG = -1e30


class TransducerBeamResult(NamedTuple):
    tokens: jnp.ndarray  # [B, W, L] -1-padded, best first
    lengths: jnp.ndarray  # [B, W]
    scores: jnp.ndarray  # [B, W] log path probability


def _flat_pred_step(params, cfg, states, tokens):
    """Advance the prediction net for [B, W] tokens. states leaves [B, W, H]."""
    b, w = tokens.shape
    flat = lambda x: x.reshape(b * w, *x.shape[2:])
    fs = jax.tree.map(flat, states)
    g, ns = predict(params, cfg, tokens.reshape(b * w, 1), initial_states=fs)
    unflat = lambda x: x.reshape(b, w, *x.shape[1:])
    return unflat(g[:, 0]), jax.tree.map(unflat, ns)


def _gather_beam(tree, idx):
    """Gather beam dim 1 by idx [B, W'] on every [B, W, ...] leaf."""

    def one(x):
        ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, ix, axis=1)

    return jax.tree.map(one, tree)


def beam_init(params, cfg: TransducerConfig, batch_size: int,
              beam_width: int, max_len: int, fusion_lm=None):
    """Initial beam: one live hypothesis (SOS consumed), others dead.

    The dict is a fixed-shape pytree, so it can ride a ``StreamState``
    across chunks (the same carryable decomposition as the CTC prefix
    beam's ``beam_init/advance/finalize``). With ``fusion_lm`` the dict
    additionally carries the LM state + cached next-token log-probs;
    ``beam_advance`` must then receive the same ``fusion_lm``.
    """
    b, w = batch_size, beam_width
    states0 = pred_initial_states(cfg, b * w)
    g0, states0 = predict(
        params, cfg, jnp.full((b * w, 1), cfg.blank_id, jnp.int32),
        initial_states=states0,
    )
    unflat = lambda x: x.reshape(b, w, *x.shape[1:])
    beam = {
        "score": jnp.full((b, w), _NEG).at[:, 0].set(0.0),
        "g": unflat(g0[:, 0]),
        "states": jax.tree.map(unflat, states0),
        "prefix": jnp.full((b, w, max_len), -1, jnp.int32),
        "plen": jnp.zeros((b, w), jnp.int32),
    }
    if fusion_lm is not None:
        beam["lm_state"], beam["lm_logp"] = fusion_lm.init(b, w)
    return beam


def beam_advance(params, cfg: TransducerConfig, beam, f_proj, n_valid,
                 max_symbols: int | None = None,
                 fusion_lm=None, lm_weight: float = 0.0):
    """Advance the beam over ``f_proj`` [B, F, J]'s first ``n_valid`` [B]
    frames (rows past their count stay frozen bit-exactly).

    ``fusion_lm``/``lm_weight``: shallow fusion (module docstring) —
    ``beam`` must have been built by ``beam_init`` with the same
    ``fusion_lm`` so the carried LM leaves exist. ``beam["score"]`` then
    accumulates the FUSED objective (AM path + lm_weight * LM prefix).
    """
    b, t, _ = f_proj.shape
    w = beam["score"].shape[1]
    s = max_symbols or cfg.max_symbols_per_frame
    max_len = beam["prefix"].shape[2]
    blank = cfg.blank_id
    v1 = cfg.vocab_with_blank
    use_lm = fusion_lm is not None and lm_weight
    if use_lm and "lm_logp" not in beam:
        raise ValueError("fusion_lm passed but beam carries no LM state — "
                         "build it with beam_init(..., fusion_lm=...)")
    frame_ok = (jnp.arange(t)[:, None] < n_valid[None, :])  # [T, B]

    def frame(beam, inp):
        f_t, ok = inp  # [B, J], [B]
        live = beam  # hypotheses still expanding this frame
        committed = None
        # s expansion rounds need s+1 blank scorings: a run of exactly s
        # labels must still commit its terminating blank AFTER the last
        # expansion, else full-budget runs are unreachable (at s=1 the beam
        # could never emit anything — caught by review + regression test)
        for r in range(s + 1):
            lp = jax.nn.log_softmax(
                joint_logits(params, f_t[:, None, :], live["g"]), axis=-1
            )  # [B, W, V+1]
            # blank commitment -> candidate for the next frame's pool
            blank_score = live["score"] + lp[..., blank]
            if committed is None:
                committed = {**live, "score": blank_score}
            else:
                cat = lambda a, bb: jnp.concatenate([a, bb], axis=1)
                pool = jax.tree.map(cat, committed, {**live, "score": blank_score})
                _, top = jax.lax.top_k(pool["score"], w)
                committed = _gather_beam(pool, top)
            if r == s:
                break
            # label expansions -> next round's live set
            lab = live["score"][..., None] + lp[..., :blank]  # [B, W, V]
            if use_lm:  # shallow fusion on label emissions only
                lab = lab + lm_weight * live["lm_logp"][..., :blank]
            # hypotheses at the prefix cap stop expanding (score floor)
            lab = jnp.where((live["plen"] < max_len)[..., None], lab, _NEG)
            flat_scores = lab.reshape(b, w * (v1 - 1))
            top_scores, flat_idx = jax.lax.top_k(flat_scores, w)
            parent = flat_idx // (v1 - 1)
            token = (flat_idx % (v1 - 1)).astype(jnp.int32)
            new_live = _gather_beam(live, parent)
            g_new, st_new = _flat_pred_step(params, cfg, new_live["states"], token)
            plen = jnp.minimum(new_live["plen"], max_len - 1)
            prefix = jax.vmap(
                lambda p, pos, tok: jax.vmap(
                    lambda pr, po, tk: pr.at[po].set(tk)
                )(p, pos, tok)
            )(new_live["prefix"], plen, token)
            live = {
                "score": top_scores,
                "g": g_new,
                "states": st_new,
                "prefix": prefix,
                "plen": jnp.minimum(new_live["plen"] + 1, max_len),
            }
            if use_lm:  # advance the LM once per accepted token
                live["lm_state"], live["lm_logp"] = fusion_lm.step(
                    new_live["lm_state"], token
                )
            elif "lm_state" in beam:
                # carried LM leaves but zero weight: keep the pytree
                # structure intact (parent-gathered, not advanced)
                live["lm_state"] = new_live["lm_state"]
                live["lm_logp"] = new_live["lm_logp"]
        # rows past their encoder length keep the incoming beam untouched
        keep = ok.reshape(b, 1)
        nxt = jax.tree.map(
            lambda n, o: jnp.where(keep.reshape(keep.shape + (1,) * (n.ndim - 2)), n, o),
            committed, beam,
        )
        return nxt, None

    beam, _ = jax.lax.scan(frame, beam, (jnp.swapaxes(f_proj, 0, 1), frame_ok))
    return beam


def beam_finalize(beam) -> TransducerBeamResult:
    """Sort hypotheses best-first."""
    order = jnp.argsort(-beam["score"], axis=1)
    beam = _gather_beam(beam, order)
    return TransducerBeamResult(beam["prefix"], beam["plen"], beam["score"])


def transducer_beam_search(
    params,
    cfg: TransducerConfig,
    f_proj,  # [B, T, J]
    enc_len,  # [B]
    beam_width: int = 8,
    max_symbols: int | None = None,
    max_len: int | None = None,
    fusion_lm=None,
    lm_weight: float = 0.0,
):
    """Beam search over joint-space encoder activations.

    Returns hypotheses sorted best-first per row; ``scores`` are raw log
    path probabilities — or the fused ``AM + lm_weight * LM`` objective
    when shallow fusion is on (length normalization is the caller's
    policy, as in ``attention_beam.py``). ``max_len`` caps hypothesis
    length; the default ``T * max_symbols`` is the same bound greedy's
    output buffer has, so beam transcripts are never truncated relative
    to greedy.
    """
    b, t, _ = f_proj.shape
    s = max_symbols or cfg.max_symbols_per_frame
    beam = beam_init(params, cfg, b, beam_width, max_len or t * s,
                     fusion_lm=fusion_lm)
    beam = beam_advance(params, cfg, beam, f_proj, enc_len, max_symbols=s,
                        fusion_lm=fusion_lm, lm_weight=lm_weight)
    return beam_finalize(beam)
