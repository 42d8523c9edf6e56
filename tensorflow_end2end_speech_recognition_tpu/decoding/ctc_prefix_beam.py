"""Batched CTC prefix beam search, fully on device.

Replaces the reference's ``tf.nn.ctc_beam_search_decoder`` (single-threaded
C++ **CPU** kernel, SURVEY.md §2.8) with a TPU-resident design: the beam is a
fixed-width tensor program — no hashes maps, no ragged work — so the whole
search jits and scans over time.

Per frame, candidates are generated for every live prefix:
- **stay** (the prefix absorbs a blank, or repeats its last char), and
- **extend** with one of the top-K non-blank classes.

Prefix identity is tracked with two independent 32-bit rolling hashes
(collision probability ~2^-64 per pair); duplicate candidates produced by
different parents (the classic prefix-merge) are combined with an O(N^2)
equality-masked logsumexp, N = W*(K+1) — small, dense, VPU-friendly — then
``lax.top_k`` keeps the best W by combined (blank + non-blank) mass.

Shallow fusion adds ``lm_weight * logp_lm(c | prefix)`` to extension
candidates. Two hooks:

- ``fusion_lm`` (preferred): a :class:`FusionLM` whose recurrent state is
  CARRIED per beam slot and advanced once per accepted extension, with
  beam-parent gathers on selection — O(T) LM steps per utterance, the same
  incremental design the attention beam uses.
- ``lm_logp_fn`` (stateless fallback): re-scores every prefix from scratch
  each frame — O(T·L) LM steps; kept for arbitrary prefix-scoring functions.

Reference pattern sources for the merge-by-sort/top-k shape: PAPERS.md #1/#2
(GPU CTC decoding). Algorithm follows Hannun et al.'s prefix beam search.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

_NEG = -1e30
_H1_MULT = jnp.uint32(2654435761)  # Knuth multiplicative
_H2_MULT = jnp.uint32(40503)


class FusionLM(NamedTuple):
    """Carried-state LM interface for shallow fusion inside the beam scan.

    ``init(b, w) -> (state, logp [B, W, C])``: per-slot LM state after
    consuming <sos>, plus the next-token distribution mapped onto the CTC
    class space (the blank column is ignored — blanks never extend).
    ``step(state, tokens [B, W]) -> (state, logp [B, W, C])``: advance every
    slot by one token. State leaves must be [B, W, ...] so beam-parent
    gathers can reindex them.
    """

    init: Callable[[int, int], tuple[Any, jnp.ndarray]]
    step: Callable[[Any, jnp.ndarray], tuple[Any, jnp.ndarray]]


class BeamState(NamedTuple):
    prefixes: jnp.ndarray  # [B, W, L] int32, -1 padded
    lengths: jnp.ndarray  # [B, W]
    last: jnp.ndarray  # [B, W] last char (-1 if empty)
    h1: jnp.ndarray  # [B, W] uint32 rolling hash 1
    h2: jnp.ndarray  # [B, W] uint32 rolling hash 2
    pb: jnp.ndarray  # [B, W] log prob ending in blank
    pnb: jnp.ndarray  # [B, W] log prob ending in non-blank
    lm_score: jnp.ndarray  # [B, W] accumulated LM log prob (0 without LM)
    lm_state: Any = None  # carried FusionLM state (leaves [B, W, ...])
    lm_logp: jnp.ndarray | None = None  # cached next-token logp [B, W, C]


def beam_init(
    b: int,
    beam_width: int,
    max_prefix_len: int,
    fusion_lm: FusionLM | None = None,
    lm_weight: float = 0.0,
) -> BeamState:
    """Fresh beam state (empty prefix live in slot 0)."""
    w = beam_width
    # Dead initial slots (1..W-1) get distinct sentinel hashes so they can
    # never merge with the live empty prefix in slot 0: otherwise every
    # frame-0 candidate set contains W copies of the empty prefix, and any
    # duplicate that survives selection (when live candidates < W) would
    # re-merge — and double-count — the live prefix's mass on later frames.
    slot = jnp.arange(w, dtype=jnp.uint32)
    sent1 = jnp.where(slot == 0, 0, jnp.uint32(0x80000000) + slot)
    sent2 = jnp.where(slot == 0, 0, jnp.uint32(0xC0000000) + slot)
    use_fusion = fusion_lm is not None and lm_weight
    lm_state0, lm_logp0 = fusion_lm.init(b, w) if use_fusion else (None, None)
    return BeamState(
        prefixes=jnp.full((b, w, max_prefix_len), -1, jnp.int32),
        lengths=jnp.zeros((b, w), jnp.int32),
        last=jnp.full((b, w), -1, jnp.int32),
        h1=jnp.broadcast_to(sent1, (b, w)),
        h2=jnp.broadcast_to(sent2, (b, w)),
        # explicit dtypes: a weak-typed leaf here would change aval on the
        # FIRST advance (weak->strong), so every jitted driver that threads
        # the state back in would silently compile its program TWICE — on the
        # remote backend that second compile measured as 100-800 ms/chunk
        # "dispatch overhead" in streaming-beam sessions (BASELINE.md r3)
        pb=jnp.full((b, w), _NEG, jnp.float32).at[:, 0].set(0.0),
        pnb=jnp.full((b, w), _NEG, jnp.float32),
        lm_score=jnp.zeros((b, w), jnp.float32),
        lm_state=lm_state0,
        lm_logp=lm_logp0,
    )


def beam_finalize(state: BeamState, lm_weight: float = 0.0):
    """(prefixes [B, W, L], lengths, scores), sorted best-first."""
    scores = jnp.logaddexp(state.pb, state.pnb) + lm_weight * state.lm_score
    order = jnp.argsort(-scores, axis=1)
    return (
        jnp.take_along_axis(state.prefixes, order[..., None], axis=1),
        jnp.take_along_axis(state.lengths, order, axis=1),
        jnp.take_along_axis(scores, order, axis=1),
    )


def beam_advance(
    state: BeamState,
    logits: jnp.ndarray,  # [B, Tc, C] — a chunk (or the whole utterance)
    valid_len: jnp.ndarray,  # [B] frames of this chunk to consume per row
    blank_id: int,
    top_k_classes: int | None = None,
    lm_logp_fn=None,
    lm_weight: float = 0.0,
    fusion_lm: FusionLM | None = None,
):
    """Advance the beam over one chunk of frames.

    The SAME per-frame body drives offline decoding (one call over the full
    utterance) and streaming (one call per chunk with the carried state):
    rows freeze bit-exactly past their ``valid_len``, so chunk boundaries
    do not change the math.
    """
    b, t, c = logits.shape
    w = state.pb.shape[1]
    k = min(top_k_classes or 16, c - 1)
    l_max = state.prefixes.shape[2]
    use_fusion = fusion_lm is not None and lm_weight
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logit_len = valid_len

    def step(state, ti):
        lp = log_probs[:, ti]  # [B, C]
        lp_blank = lp[:, blank_id]  # [B]
        lp_nb = lp.at[:, blank_id].set(_NEG)
        top_lp, top_idx = jax.lax.top_k(lp_nb, k)  # [B, K]

        # ---- stay candidates (W) ------------------------------------------
        stay_pb = jnp.logaddexp(state.pb, state.pnb) + lp_blank[:, None]
        lp_last = jnp.take_along_axis(lp, jnp.maximum(state.last, 0), axis=-1)
        stay_pnb = jnp.where(state.last >= 0, state.pnb + lp_last, _NEG)

        # ---- extension candidates (W*K) -----------------------------------
        # parent (b, w) extended with class top_idx[b, j]
        ext_c = jnp.broadcast_to(top_idx[:, None, :], (b, w, k))  # [B, W, K]
        ext_lp = jnp.broadcast_to(top_lp[:, None, :], (b, w, k))
        same_as_last = ext_c == state.last[..., None]
        base = jnp.where(
            same_as_last, state.pb[..., None],
            jnp.logaddexp(state.pb[..., None], state.pnb[..., None]),
        )
        ext_pnb = base + ext_lp
        # dead parents must not spawn candidates
        parent_dead = jnp.maximum(state.pb, state.pnb) <= _NEG / 2
        ext_pnb = jnp.where(parent_dead[..., None], _NEG, ext_pnb)
        # full prefixes cannot extend further
        ext_pnb = jnp.where((state.lengths >= l_max)[..., None], _NEG, ext_pnb)
        if use_fusion:
            # carried state: the next-token distribution is already cached
            ext_lm = jnp.take_along_axis(state.lm_logp, ext_c, axis=-1)  # [B, W, K]
        elif lm_logp_fn is not None and lm_weight:
            lm_lp = lm_logp_fn(state.prefixes, state.lengths)  # [B, W, C]
            ext_lm = jnp.take_along_axis(lm_lp, ext_c, axis=-1)  # [B, W, K]
        else:
            ext_lm = jnp.zeros((b, w, k))

        cu = jnp.uint32(1)
        ext_h1 = state.h1[..., None] * _H1_MULT + ext_c.astype(jnp.uint32) + cu
        ext_h2 = state.h2[..., None] * _H2_MULT + ext_c.astype(jnp.uint32) + cu

        # ---- concatenate candidate sets -----------------------------------
        n = w + w * k
        cand_pb = jnp.concatenate([stay_pb, jnp.full((b, w * k), _NEG)], axis=1)
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(b, w * k)], axis=1)
        cand_h1 = jnp.concatenate([state.h1, ext_h1.reshape(b, w * k)], axis=1)
        cand_h2 = jnp.concatenate([state.h2, ext_h2.reshape(b, w * k)], axis=1)
        cand_parent = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.arange(w)[None], (b, w)),
                jnp.broadcast_to(jnp.repeat(jnp.arange(w), k)[None], (b, w * k)),
            ],
            axis=1,
        )
        cand_char = jnp.concatenate(
            [jnp.full((b, w), -1, jnp.int32), ext_c.reshape(b, w * k)], axis=1
        )
        cand_lm = jnp.concatenate(
            [state.lm_score, (state.lm_score[..., None] + ext_lm).reshape(b, w * k)],
            axis=1,
        )

        # ---- merge candidates with identical prefixes ---------------------
        same = (cand_h1[:, :, None] == cand_h1[:, None, :]) & (
            cand_h2[:, :, None] == cand_h2[:, None, :]
        )  # [B, N, N]
        def masked_lse(v):
            vm = jnp.where(same, v[:, None, :], _NEG)  # row i gathers dups j
            m = jnp.max(vm, axis=-1)
            return m + jnp.log(jnp.sum(jnp.exp(vm - m[..., None]), axis=-1))
        # keep only the first occurrence of each prefix; non-first duplicates
        # must lose their pb/pnb mass too, not just their selection score —
        # a duplicate selected into the beam (possible whenever live
        # candidates < W) would otherwise re-merge its copy of a live
        # prefix's mass every subsequent frame, inflating scores
        idx = jnp.arange(n)
        first_dup = jnp.argmax(same, axis=-1)  # first j with same prefix
        is_first = first_dup == idx[None, :]
        merged_pb = jnp.where(is_first, masked_lse(cand_pb), _NEG)
        merged_pnb = jnp.where(is_first, masked_lse(cand_pnb), _NEG)
        merged_total = jnp.logaddexp(merged_pb, merged_pnb) + lm_weight * cand_lm
        merged_total = jnp.where(is_first, merged_total, _NEG)

        # ---- select top-W -------------------------------------------------
        top_score, sel = jax.lax.top_k(merged_total, w)  # [B, W]
        sel_parent = jnp.take_along_axis(cand_parent, sel, axis=1)
        sel_char = jnp.take_along_axis(cand_char, sel, axis=1)
        gather = lambda v: jnp.take_along_axis(v, sel, axis=1)
        parent_gather = lambda v: jnp.take_along_axis(v, sel_parent, axis=1)

        new_prefixes = jnp.take_along_axis(
            state.prefixes, sel_parent[..., None], axis=1
        )
        new_len = parent_gather(state.lengths)
        # a starved beam can select a masked (_NEG) extension of a
        # full-length prefix; the char write below already misses (no
        # position == l_max), so the length must not advance either or
        # lengths would disagree with the prefix contents
        is_ext = (sel_char >= 0) & (new_len < l_max)
        # write the new char at position len for extension candidates
        one_hot_pos = (
            jnp.arange(l_max)[None, None, :] == new_len[..., None]
        ) & is_ext[..., None]
        new_prefixes = jnp.where(one_hot_pos, sel_char[..., None], new_prefixes)
        new_lm_state, new_lm_logp = state.lm_state, state.lm_logp
        if use_fusion:
            # advance the LM once per accepted extension (parent-gathered,
            # exactly like attention_beam's incremental LM state)
            def pgather(v):
                idx = sel_parent.reshape((b, w) + (1,) * (v.ndim - 2))
                return jnp.take_along_axis(v, idx, axis=1)

            par_state = jax.tree.map(pgather, state.lm_state)
            par_logp = pgather(state.lm_logp)
            adv_state, adv_logp = fusion_lm.step(
                par_state, jnp.where(is_ext, sel_char, 0)
            )

            def pick(n, o):
                return jnp.where(is_ext.reshape((b, w) + (1,) * (n.ndim - 2)), n, o)

            new_lm_state = jax.tree.map(pick, adv_state, par_state)
            new_lm_logp = jnp.where(is_ext[..., None], adv_logp, par_logp)
        new_state = BeamState(
            prefixes=new_prefixes,
            lengths=new_len + is_ext.astype(jnp.int32),
            last=jnp.where(is_ext, sel_char, parent_gather(state.last)),
            h1=gather(cand_h1),
            h2=gather(cand_h2),
            pb=gather(merged_pb),
            pnb=gather(merged_pnb),
            lm_score=gather(cand_lm),
            lm_state=new_lm_state,
            lm_logp=new_lm_logp,
        )
        # frames past logit_len: carry state unchanged
        active = (ti < logit_len)[:, None]
        def sel_active(new, old):
            bc = active.reshape((b,) + (1,) * (new.ndim - 1))
            return jnp.where(bc, new, old)
        merged_state = jax.tree.map(sel_active, new_state, state)
        return merged_state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(t))
    return state


def ctc_prefix_beam_search(
    logits: jnp.ndarray,  # [B, T, C]
    logit_len: jnp.ndarray,  # [B]
    blank_id: int,
    beam_width: int = 20,
    top_k_classes: int | None = None,
    max_prefix_len: int | None = None,
    lm_logp_fn=None,  # (prefixes [B,W,L], lengths [B,W]) -> logp [B,W,C]
    lm_weight: float = 0.0,
    fusion_lm: FusionLM | None = None,  # carried-state LM (preferred)
):
    """Returns (prefixes [B, W, L], lengths [B, W], scores [B, W]) sorted best-first.

    Scores are total log probabilities log(p_blank + p_nonblank) (+ weighted
    LM score when fusion is active). Composed from ``beam_init`` /
    ``beam_advance`` / ``beam_finalize`` — streaming decode drives the same
    body chunk by chunk (``streaming.py``).
    """
    b, t, _ = logits.shape
    state = beam_init(b, beam_width, max_prefix_len or t, fusion_lm, lm_weight)
    state = beam_advance(
        state, logits, logit_len, blank_id, top_k_classes,
        lm_logp_fn, lm_weight, fusion_lm,
    )
    return beam_finalize(state, lm_weight)
