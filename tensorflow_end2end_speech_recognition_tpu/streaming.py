"""Streaming (online) recognition: chunked audio in, incremental tokens out.

A TPU-first extension with no reference counterpart (the reference decoded
whole utterances offline — SURVEY.md §3.3): audio arrives in fixed-size
chunks and the recognizer emits CTC tokens incrementally with bounded
latency. Everything is static-shaped and jittable, so a serving process
compiles ONE chunk program and reuses it for the stream's lifetime — the
same design contract as the frozen batch artifact (``serving.py``).

Design:

- **Framing carry.** Overlapping frames (25 ms window / 10 ms hop) straddle
  chunk boundaries. The stream state holds the last ``K`` samples, where
  ``K = hop * ceil((window - hop)/hop)`` (320 at 16 kHz) — sized so the
  carried samples always start on a global hop boundary. Each step frames
  ``concat(carry, chunk)`` with the SAME fused matmul frontend as offline
  (``frontend.extract_features``), so streamed features are bit-identical
  to offline features of the same samples. The initial zero-carry produces
  ``K/hop`` garbage frames once; they are rolled off and never emitted.
- **Encoder carry.** Unidirectional LSTM/GRU layers resume from carried
  ``(h, c)`` via ``rnn_scan(initial_state=...)``; masked (pad) steps carry
  state unchanged, so short final chunks leave the state at the true
  stream end.
- **Decode carry.** Greedy CTC collapse carries the previous frame's argmax
  across chunks, so repeats spanning a boundary collapse exactly as the
  offline decoder (``decoding/ctc_greedy.py``) would.

Constraints (checked at build time): the acoustic frontend must be causal —
no deltas (±2 future frames), no per-utterance CMVN (whole-utterance
statistics), no frame stacking/splicing — and the encoder unidirectional
(``encoder_type`` ``lstm`` or ``gru``). Rows are fully independent: each
row of a step receives either a FULL chunk (``chunk_len == chunk_samples``,
stream continues), a partial/empty chunk (``chunk_len < chunk_samples`` =
the stream's final samples — afterwards the row emits nothing), or
``chunk_len == 0`` with the row *paused* (its state freezes bit-exactly, so
a serving process can multiplex independent sessions over the batch slots
and step whenever ANY session has a full chunk buffered). A new stream
takes over a slot by resetting that row's state (``reset_rows``).

Chunk size must be a multiple of the hop; per chunk of ``C`` samples the
step emits at most ``C/hop`` frames of tokens.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .frontend import extract_features
from .models.rnn import rnn_scan
from .train.ctc_task import CTCTaskConfig


class StreamState(NamedTuple):
    sample_carry: jnp.ndarray  # [B, K] last samples (hop-aligned)
    samples_seen: jnp.ndarray  # [B] valid samples fed so far
    frame_base: jnp.ndarray  # [B] global frame index of buffer frame 0
    rnn_states: tuple  # per layer: (h, c) or (h,)
    prev_id: jnp.ndarray  # [B] previous frame argmax (-1 before any frame)
    beam: tuple | None = None  # carried CTC prefix-beam state (beam mode):
    # the step emits greedy partials live; beam hypotheses are revisable, so
    # the beam transcript comes from finalize_fn at stream end
    # frame stacking (num_stack/num_skip > 1): base-frame remainder not yet
    # consumed by a stacked window, stored RIGHT-aligned in its buffer so
    # concat(frame_carry, new_frames) is contiguous (None when unstacked —
    # keeps the v1 artifact state layout unchanged)
    frame_carry: jnp.ndarray | None = None  # [B, num_stack-1, D]
    carry_len: jnp.ndarray | None = None  # [B] valid frames in frame_carry
    # transducer mode: (g [B, J], prediction-net states) — the carried
    # decoder context; frame-synchronous greedy continues across chunks
    # exactly where the previous chunk stopped
    transducer: tuple | None = None
    # chunk-causal conformer/transformer encoders (left_context >= 0):
    # (enc_seen [B], per-layer (k, v[, conv]) caches) — see
    # models/conformer_stream.py. None for recurrent encoders.
    conformer: tuple | None = None
    # [B, 1] the global sample immediately before this buffer: preemphasis
    # at each chunk's first sample then matches the unchunked signal
    # exactly (without it every chunk-BOUNDARY frame differed from offline
    # by up to ~0.5 log-mel — a real round-2 bug the conformer streaming
    # equality tests exposed; the LSTM tests' argmaxes happened to survive)
    preemph_ctx: jnp.ndarray | None = None


def _validate(task):
    from .train.transducer_task import TransducerTaskConfig

    if not isinstance(task, (CTCTaskConfig, TransducerTaskConfig)):
        raise ValueError("streaming supports CTC and transducer tasks "
                         "(attention decoders are not causal)")
    fe = task.frontend
    if fe is None:
        raise ValueError("streaming needs the waveform frontend (precomputed-"
                         "feature corpora are offline by definition)")
    if fe.add_deltas:
        raise ValueError("streaming frontend must be causal: set add_deltas "
                         "false (deltas need future frames)")
    if fe.cmvn != "none":
        raise ValueError("per-utterance/per-speaker CMVN is not causal (or "
                         "needs out-of-band stats); use cmvn: none for "
                         "streaming models")
    if task.splice != 0:
        raise ValueError(
            "streaming supports splice=0 only (context splicing is "
            "non-causal: it needs future frames on the right edge)"
        )
    if task.num_skip > task.num_stack:
        raise ValueError(
            "streaming frame stacking needs num_skip <= num_stack (gapped "
            "subsampling would need negative frame carry)"
        )
    enc = task.model.encoder
    if enc.encoder_type in ("conformer", "transformer"):
        if enc.left_context < 0:
            raise ValueError(
                "streaming a conformer/transformer needs left_context >= 0 "
                "(chunk-causal attention + causal conv); bidirectional "
                "stacks have an unbounded window"
            )
        if enc.pos_encoding == "relative":
            raise ValueError(
                "streaming supports pos_encoding absolute/rotary (the "
                "relative scheme's rel-shift needs square score matrices)"
            )
    elif enc.encoder_type not in ("lstm", "gru"):
        raise ValueError(
            f"streaming needs a causal encoder (lstm/gru, or conformer/"
            f"transformer with left_context >= 0), got {enc.encoder_type!r}"
        )
    if isinstance(task, CTCTaskConfig) and task.model.num_classes_sub is not None:
        raise ValueError("streaming decodes the main task only")


def reset_rows(state: StreamState, fresh: StreamState, rows_mask) -> StreamState:
    """Reset selected rows to a fresh stream start (slot reuse).

    ``fresh`` is any state from ``init_fn`` (same batch size); ``rows_mask``
    is a [B] bool mask of rows a new stream takes over. Every state leaf has
    a leading batch dim, so this is a uniform per-row select.
    """
    m = jnp.asarray(rows_mask, bool)

    def sel(f, o):
        return jnp.where(m.reshape((-1,) + (1,) * (o.ndim - 1)), f, o)

    return jax.tree.map(sel, fresh, state)


def carry_samples(frontend) -> int:
    """K: carried samples between chunks (hop-aligned window overlap)."""
    length, step = frontend.frame_length, frontend.frame_step
    if length <= step:
        return 0
    return step * (-(-(length - step) // step))


def build_streaming_fn(task, params, chunk_samples: int,
                       beam_width: int = 1, top_k_classes: int = 16,
                       max_prefix_len: int = 200,
                       lm=None, lm_weight: float = 0.0):
    """Returns ``(init_fn, step_fn)`` — plus ``finalize_fn`` in beam mode.

    ``lm``: (lm_params, LMConfig) adds RNN-LM shallow fusion to the carried
    beam (CTC prefix beam and transducer beam alike): the LM state rides
    ``StreamState.beam`` per slot, so chunked+fused equals the offline
    fused beam search exactly. Beam mode only (greedy ignores it, as in
    ``bin/eval.py``).

    ``task`` is a ``CTCTaskConfig`` or ``TransducerTaskConfig`` (transducer
    mode carries (g, prediction-state) and emits frame-synchronous greedy
    tokens; ``beam_width > 1`` additionally carries the time-synchronous
    transducer beam across chunks, finalize semantics as in CTC beam mode).

    ``init_fn(batch_size)`` -> zeroed ``StreamState``.
    ``step_fn(state, chunk [B, C], chunk_len [B])`` ->
    ``(state, tokens [B, F] -1-padded, tok_len [B])`` with ``F = C/hop``;
    jit it once and drive the stream. Token rows concatenated over chunks
    equal the offline greedy decode of the concatenated audio.

    ``beam_width > 1`` additionally carries a CTC prefix-beam across chunks
    (``decoding/ctc_prefix_beam.py`` — the SAME per-frame body as offline,
    so ``finalize_fn(state) -> (prefixes [B,W,L], lengths, scores)`` equals
    the offline beam search of the whole utterance). The per-chunk tokens
    remain the live greedy partials (beam hypotheses are revisable until
    the stream ends); returns ``(init_fn, step_fn, finalize_fn)``.

    Frame stacking (``num_stack``/``num_skip`` > 1, VERDICT r2 #6): the step
    carries the base-frame remainder between chunks and feeds the encoder
    stacked frames bit-identical to the offline ``stack_frames`` windows. A
    stacked stream must signal its END explicitly when it terminates on an
    exact chunk boundary — pass ``chunk_len = -1`` (a "final, zero new
    samples" flush) so the tail windows (zero-padded like offline) are
    emitted; a final PARTIAL chunk (``0 < chunk_len < chunk_samples``)
    flushes implicitly, as in v1. Unstacked streams ignore the distinction
    (they hold nothing back).
    """
    _validate(task)
    from .train.transducer_task import TransducerTaskConfig

    is_transducer = isinstance(task, TransducerTaskConfig)
    fe = task.frontend
    cfg = task.model
    fusion_lm = None
    if lm is not None and lm_weight and beam_width > 1:
        from .models.lm import make_fusion_lm

        lm_params, lm_cfg = lm
        # both class layouts put blank LAST, so the CTC adapter serves both
        fusion_lm = make_fusion_lm(
            lm_params, lm_cfg, sos_id=lm_cfg.vocab - 2,
            num_ctc_classes=cfg.vocab_with_blank,
        )
    enc_cfg = cfg.encoder
    is_conformer = enc_cfg.encoder_type in ("conformer", "transformer")
    conf_spec = enc_cfg.conformer_spec() if is_conformer else None
    spec = None if is_conformer else enc_cfg.spec()
    step_sz, length = fe.frame_step, fe.frame_length
    if chunk_samples % step_sz != 0:
        raise ValueError(
            f"chunk_samples ({chunk_samples}) must be a multiple of the hop "
            f"({step_sz})"
        )
    if chunk_samples + carry_samples(fe) < length:
        raise ValueError("chunk too short: carry + chunk must cover one window")
    k = carry_samples(fe)
    f_out = chunk_samples // step_sz  # base frames emitted per full chunk
    n_stack, n_skip = task.num_stack, task.num_skip
    stacked = n_stack > 1 or n_skip > 1
    feat_dim = fe.feature_dim

    def init_fn(batch_size: int) -> StreamState:
        def layer_state(_):
            h = jnp.zeros((batch_size, spec.out_dim), jnp.float32)
            if spec.cell == "lstm":
                return (h, jnp.zeros((batch_size, spec.num_units), jnp.float32))
            return (h,)

        conformer = None
        if is_conformer:
            from .models.conformer_stream import conformer_cache_init

            conformer = conformer_cache_init(conf_spec, batch_size)

        beam = None
        if beam_width > 1 and not is_transducer:
            from .decoding.ctc_prefix_beam import beam_init

            beam = beam_init(batch_size, beam_width, max_prefix_len,
                             fusion_lm=fusion_lm, lm_weight=lm_weight)
        transducer = None
        if is_transducer:
            from .decoding.transducer_greedy import decoder_init

            transducer = decoder_init(params, cfg, batch_size)
            if beam_width > 1:
                from .decoding.transducer_beam import beam_init as t_beam_init

                beam = t_beam_init(params, cfg, batch_size, beam_width,
                                   max_prefix_len, fusion_lm=fusion_lm)
        return StreamState(
            sample_carry=jnp.zeros((batch_size, k), jnp.float32),
            samples_seen=jnp.zeros((batch_size,), jnp.int32),
            # buffer frame 0 sits K samples before the stream start
            frame_base=jnp.full((batch_size,), -(k // step_sz), jnp.int32),
            rnn_states=(() if is_conformer else
                        tuple(layer_state(i) for i in range(enc_cfg.num_layers))),
            prev_id=jnp.full((batch_size,), -1, jnp.int32),
            beam=beam,
            frame_carry=(
                jnp.zeros((batch_size, n_stack - 1, feat_dim), jnp.float32)
                if stacked else None
            ),
            carry_len=jnp.zeros((batch_size,), jnp.int32) if stacked else None,
            transducer=transducer,
            conformer=conformer,
            preemph_ctx=jnp.zeros((batch_size, 1), jnp.float32),
        )

    from .models.ctc import _affine  # affine head shared with the batch path

    def step_fn(state: StreamState, chunk, chunk_len):
        chunk = jnp.asarray(chunk, jnp.float32)
        chunk_len = jnp.asarray(chunk_len, jnp.int32)
        # chunk_len < 0: explicit end-of-stream flush with no new samples
        # (stacked streams ending on an exact chunk boundary — see docstring)
        explicit_final = chunk_len < 0
        eff_len = jnp.where(explicit_final, 0, chunk_len)
        buf = jnp.concatenate([state.sample_carry, chunk], axis=1)
        # preemphasis continuity across chunk boundaries (see StreamState
        # .preemph_ctx): feed the carried previous sample; at stream start
        # the offline convention is prev = first sample, and the last
        # zero-carry sample is patched to it so global sample 0
        # preemphasizes as (1-c)*w0 exactly like the unchunked signal
        fresh = state.samples_seen == 0
        ctx = jnp.where(fresh[:, None], chunk[:, :1], state.preemph_ctx)
        if k > 0:
            patched = jnp.where(fresh, chunk[:, 0], buf[:, k - 1])
            buf = jnp.concatenate(
                [buf[:, : k - 1], patched[:, None], buf[:, k:]], axis=1
            )
        feats, _ = extract_features(buf, k + eff_len, fe,
                                    preemph_context=ctx)  # [B, Fb, D]
        fb = feats.shape[1]

        active = eff_len > 0  # rows with chunk_len == 0 are paused: freeze
        is_final = explicit_final | (active & (eff_len < chunk_samples))
        new_total = state.samples_seen + eff_len
        total_frames = jnp.maximum(0, 1 + (new_total - length) // step_sz)
        emitted = jnp.maximum(state.frame_base, 0)
        lead = jnp.maximum(0, -state.frame_base)  # initial zero-carry frames
        # per-row shift-out of the zero-carry preamble (rows are independent)
        idx = jnp.minimum(jnp.arange(fb)[None, :] + lead[:, None], fb - 1)
        feats = jnp.take_along_axis(feats, idx[..., None], axis=1)
        n_new = jnp.clip(total_frames - emitted, 0, fb)  # [B] new base frames

        new_carry_f, new_carry_len = state.frame_carry, state.carry_len
        if stacked:
            # ---- stacked-window assembly (bit-identical to offline
            # data/frame_ops.stack_frames: window j covers base frames
            # [j*skip, j*skip + stack), zero-padded past the stream end).
            # Invariant: frame_carry holds exactly the base frames from the
            # next unemitted window's start, so local window j starts at
            # j*skip in concat(carry, new_frames).
            s, sk = n_stack, n_skip
            v = state.carry_len + n_new  # [B] valid base frames buffered
            buf_f = jnp.concatenate([state.frame_carry, feats], axis=1)
            bf = buf_f.shape[1]  # s-1+fb
            # carry is stored right-aligned; shift left so valid is [0, v)
            shift = (s - 1) - state.carry_len
            fidx = jnp.minimum(jnp.arange(bf)[None, :] + shift[:, None], bf - 1)
            aligned = jnp.take_along_axis(buf_f, fidx[..., None], axis=1)
            aligned = aligned * (jnp.arange(bf)[None, :, None] < v[:, None, None])
            f_s = bf // sk + 1  # static stacked-window capacity
            need = (f_s - 1) * sk + s
            if need > bf:
                aligned = jnp.pad(aligned, ((0, 0), (0, need - bf), (0, 0)))
            widx = np.arange(f_s)[:, None] * sk + np.arange(s)[None, :]
            xs_in = aligned[:, widx, :].reshape(aligned.shape[0], f_s, s * feat_dim)
            # complete windows mid-stream; ceil(v/skip) zero-padded at end
            s_complete = jnp.maximum(0, (v - s) // sk + 1)
            s_flush = -(-v // sk)
            n_enc = jnp.where(is_final, s_flush, s_complete)
            consumed = n_enc * sk
            new_carry_len = jnp.where(is_final, 0, jnp.clip(v - consumed, 0, s - 1))
            # re-pack the remainder right-aligned for the next step
            pos = jnp.arange(s - 1)[None, :]
            src = consumed[:, None] + pos - ((s - 1) - new_carry_len)[:, None]
            src = jnp.clip(src, 0, aligned.shape[1] - 1)
            new_carry_f = jnp.take_along_axis(aligned, src[..., None], axis=1)
            new_carry_f = new_carry_f * (pos >= (s - 1 - new_carry_len)[:, None])[..., None]
            touched = active | explicit_final
            new_carry_f = jnp.where(touched[:, None, None], new_carry_f, state.frame_carry)
            new_carry_len = jnp.where(touched, new_carry_len, state.carry_len)
            f_frames = f_s
        else:
            xs_in, n_enc, f_frames = feats, n_new, fb

        xs = xs_in
        new_rnn = []
        new_conformer = state.conformer
        if is_conformer:
            from .models.conformer_stream import conformer_stream_step

            xs, new_conformer = conformer_stream_step(
                params["encoder"]["conformer"], conf_spec, state.conformer,
                xs, n_enc,
            )
        else:
            for layer, p in enumerate(params["encoder"]["layers"]):
                xs, carry = rnn_scan(
                    p, spec, xs, n_enc, initial_state=state.rnn_states[layer]
                )
                new_rnn.append(carry)

        new_beam = state.beam
        new_transducer = state.transducer
        if is_transducer:
            # frame-synchronous greedy continues from the carried (g,
            # prediction-state): the chunked emissions concatenate to the
            # offline transducer_greedy_decode exactly (tests assert it)
            from .decoding.transducer_greedy import decode_frame
            from .models.transducer import _affine as _affine_t

            f_proj = _affine_t(params["enc_proj"], xs)
            ok = jnp.arange(f_frames)[:, None] < n_enc[None, :]

            def frame(c, inp):
                f_t, m = inp
                return decode_frame(params, cfg, c, f_t, m)

            new_transducer, em = jax.lax.scan(
                frame, state.transducer, (jnp.swapaxes(f_proj, 0, 1), ok)
            )
            from .decoding.ctc_greedy import compact_rows

            width = f_frames * cfg.max_symbols_per_frame
            bsz = em.shape[1]  # em from the scan is [F, B, S]
            em = jnp.swapaxes(em, 0, 1).reshape(bsz, width)
            tokens, tok_len = compact_rows(em, em >= 0)
            new_prev = state.prev_id  # unused in transducer mode
            if beam_width > 1:
                from .decoding.transducer_beam import beam_advance as t_beam_advance

                # the transducer beam rides the chunks exactly like the CTC
                # prefix beam: greedy partials stream live above, the beam
                # transcript comes from finalize_fn at stream end
                new_beam = t_beam_advance(params, cfg, state.beam, f_proj, n_enc,
                                          fusion_lm=fusion_lm,
                                          lm_weight=lm_weight)
        else:
            if cfg.bottleneck_dim:
                xs = _affine(params["bottleneck"], xs)
            logits = _affine(params["head"], xs)  # [B, F, C+1]

            from .decoding.ctc_greedy import compact_rows

            ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            valid = jnp.arange(f_frames)[None, :] < n_enc[:, None]
            prev = jnp.concatenate([state.prev_id[:, None], ids[:, :-1]], axis=1)
            keep = valid & (ids != prev) & (ids != cfg.blank_id)
            tokens, tok_len = compact_rows(ids, keep)

            last = jnp.clip(n_enc - 1, 0, f_frames - 1)
            last_id = jnp.take_along_axis(ids, last[:, None], axis=1)[:, 0]
            new_prev = jnp.where(n_enc > 0, last_id, state.prev_id)

            if beam_width > 1:
                from .decoding.ctc_prefix_beam import beam_advance

                # the rolled logits' valid prefix is exactly the new frames;
                # the shared per-frame body freezes rows past n_enc, so
                # chunking composes to the identical offline beam
                new_beam = beam_advance(
                    state.beam, logits, n_enc, cfg.blank_id,
                    top_k_classes=top_k_classes,
                    fusion_lm=fusion_lm, lm_weight=lm_weight,
                )

        new_state = StreamState(
            # paused rows keep their carry and frame alignment bit-exactly
            sample_carry=jnp.where(
                active[:, None],
                buf[:, chunk_samples : chunk_samples + k],
                state.sample_carry,
            ),
            samples_seen=new_total,
            frame_base=jnp.where(active, state.frame_base + fb, state.frame_base),
            rnn_states=(state.rnn_states if is_conformer else tuple(new_rnn)),
            prev_id=new_prev,
            beam=new_beam,
            frame_carry=new_carry_f,
            carry_len=new_carry_len,
            transducer=new_transducer,
            conformer=new_conformer,
            # the sample before the next buffer's first carried sample
            preemph_ctx=jnp.where(
                active[:, None],
                buf[:, chunk_samples - 1 : chunk_samples],
                state.preemph_ctx,
            ),
        )
        return new_state, tokens, tok_len

    # K is sized so the buffer yields exactly C/hop frames per chunk (the
    # leftover after consuming them is again exactly K samples)
    assert (k + chunk_samples - length) // step_sz + 1 == f_out
    if beam_width > 1:
        if is_transducer:
            from .decoding.transducer_beam import beam_finalize as t_beam_finalize

            def finalize_fn(state: StreamState):
                return t_beam_finalize(state.beam)
        else:
            from .decoding.ctc_prefix_beam import beam_finalize

            def finalize_fn(state: StreamState):
                return beam_finalize(state.beam, lm_weight=lm_weight)

        return init_fn, step_fn, finalize_fn
    return init_fn, step_fn
