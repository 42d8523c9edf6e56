"""Attention seq2seq (+ joint CTC-attention) acoustic models.

Rebuilds ``models/attention/attention_seq2seq.py`` and
``models/attention/joint_ctc_attention.py`` plus the decoder internals
``attention_decoder.py`` / ``dynamic_decoder.py`` (SURVEY.md §2.3/§2.4) as a
single functional module:

- encoder (any type from ``encoders.py``; reference used pyramidal BLSTM);
- one-layer LSTM decoder: input = [embedding of previous token, previous
  context]; attention read after the cell; logits = W_o [h; context];
- training unroll is a ``lax.scan`` over the label axis with **scheduled
  sampling** (per-step Bernoulli choice between gold input and the model's
  own argmax, as in the reference's training helper);
- greedy inference is the same scan feeding back argmax with EOS-finished
  masking to ``max_decode_length``;
- the joint subclass adds a CTC head on the encoder outputs; its loss is
  mixed upstream (``ops.losses.joint_loss``).

Beam search lives in ``decoding/attention_beam.py`` (device-resident
hypothesis tensors), not here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .attention import AttentionConfig, attend, init_attention, precompute_keys
from .encoders import EncoderConfig, apply_encoder, init_encoder
from .rnn import RNNSpec, _lstm_step, dropout, init_rnn_params


class Seq2SeqConfig(NamedTuple):
    encoder: EncoderConfig = EncoderConfig(encoder_type="pyramidal_blstm", num_layers=3)
    attention: AttentionConfig = AttentionConfig()
    num_classes: int = 61  # real units; sos = num_classes, eos = num_classes + 1
    decoder_num_units: int = 256
    embedding_dim: int = 128
    logits_temperature: float = 1.0
    scheduled_sampling_prob: float = 0.0
    max_decode_length: int = 100
    dropout_decoder_keep_prob: float = 1.0
    dropout_embedding_keep_prob: float = 1.0
    # joint CTC-attention: weight of the auxiliary CTC head (0 = pure attention)
    ctc_loss_weight: float = 0.0

    @property
    def sos_id(self) -> int:
        return self.num_classes

    @property
    def eos_id(self) -> int:
        return self.num_classes + 1

    @property
    def vocab(self) -> int:  # embedding/output vocabulary incl. sos/eos
        return self.num_classes + 2

    @property
    def is_joint(self) -> bool:
        return self.ctc_loss_weight > 0.0

    def decoder_spec(self) -> RNNSpec:
        return RNNSpec(cell="lstm", num_units=self.decoder_num_units)


class Seq2SeqOutput(NamedTuple):
    logits: jnp.ndarray  # [B, U, vocab] training; [B, Umax, vocab] inference
    attention_weights: jnp.ndarray  # [B, U, T_enc]
    predicted_ids: jnp.ndarray | None = None  # greedy inference only
    ctc_logits: jnp.ndarray | None = None  # joint head
    ctc_logit_len: jnp.ndarray | None = None
    enc_out: jnp.ndarray | None = None
    enc_len: jnp.ndarray | None = None
    aux_loss: jnp.ndarray | None = None  # MoE load-balance loss (weighted)


def init_seq2seq(key, cfg: Seq2SeqConfig, input_dim: int):
    kenc, kemb, kdec, katt, kout, kctc = jax.random.split(key, 6)
    scale = cfg.encoder.parameter_init
    enc_dim = cfg.encoder.output_dim
    params = {
        "encoder": init_encoder(kenc, cfg.encoder, input_dim),
        "embedding": jax.random.uniform(kemb, (cfg.vocab, cfg.embedding_dim), jnp.float32, -scale, scale),
        "decoder_cell": init_rnn_params(
            kdec, cfg.decoder_spec(), cfg.embedding_dim + enc_dim, scale
        ),
        "attention": init_attention(katt, cfg.attention, enc_dim, cfg.decoder_num_units, scale),
        "out_proj": {
            "w": jax.random.uniform(kout, (cfg.decoder_num_units + enc_dim, cfg.vocab), jnp.float32, -scale, scale),
            "b": jnp.zeros((cfg.vocab,), jnp.float32),
        },
    }
    if cfg.is_joint:
        params["ctc_head"] = {
            "w": jax.random.uniform(kctc, (enc_dim, cfg.num_classes + 1), jnp.float32, -scale, scale),
            "b": jnp.zeros((cfg.num_classes + 1,), jnp.float32),
        }
    return params


def _decoder_step(params, cfg: Seq2SeqConfig, enc_out, enc_keys, enc_mask, carry, token, drop_key=None, train=False, fused=False):
    """One decoder step. carry = (h, c, context, align)."""
    h, c, context, align = carry
    emb = params["embedding"][token]  # [B, E]
    if train and cfg.dropout_embedding_keep_prob < 1.0 and drop_key is not None:
        emb = dropout(drop_key, emb, cfg.dropout_embedding_keep_prob, train)
    x = jnp.concatenate([emb, context], axis=-1)
    spec = cfg.decoder_spec()
    xproj = jnp.matmul(x, params["decoder_cell"]["wx"], preferred_element_type=jnp.float32) + params["decoder_cell"]["b"]
    mask_t = jnp.ones((x.shape[0], 1), bool)
    (h, c), _ = _lstm_step(spec, params["decoder_cell"], (h, c), xproj, mask_t)
    context, align = attend(
        params["attention"], cfg.attention, enc_out, enc_keys, enc_mask, h, align,
        fused=fused,
    )
    hc = jnp.concatenate([h, context], axis=-1)
    if train and cfg.dropout_decoder_keep_prob < 1.0 and drop_key is not None:
        hc = dropout(jax.random.fold_in(drop_key, 1), hc, cfg.dropout_decoder_keep_prob, train)
    logits = jnp.matmul(hc, params["out_proj"]["w"], preferred_element_type=jnp.float32) + params["out_proj"]["b"]
    if cfg.logits_temperature != 1.0:
        logits = logits / cfg.logits_temperature
    return (h, c, context, align), logits


def _init_decoder_carry(cfg: Seq2SeqConfig, enc_out):
    b, t, he = enc_out.shape
    return (
        jnp.zeros((b, cfg.decoder_num_units)),
        jnp.zeros((b, cfg.decoder_num_units)),
        jnp.zeros((b, he)),
        jnp.zeros((b, t)),
    )


def encode(params, cfg: Seq2SeqConfig, feats, feat_len, train=False, rng=None):
    # pallas_t_cap=400: the attention-decoder backward composed with Pallas
    # encoder kernels is the remote compiler's fragile class (CLAUDE.md
    # composition limits) and its boundary MOVES with the remote toolchain:
    # round 3 measured T=400 good / raised to 800; round 4 saw T=502
    # hard-crash the TPU worker and re-capped to 400; the round-5 preflight
    # measured every composition family green through T=512, the caps were
    # raised — and the first real T=502 fit() of the round crashed the
    # worker the same day. The preflight is a point sample of a flaky
    # boundary; 400 is the only value that has held across rounds 4-5.
    # Longer inputs take the whole-stack scan.
    enc = apply_encoder(params["encoder"], cfg.encoder, feats, feat_len, train, rng,
                        pallas_t_cap=400)
    ctc_logits = ctc_len = None
    if cfg.is_joint:
        ctc_logits = (
            jnp.matmul(enc.outputs, params["ctc_head"]["w"], preferred_element_type=jnp.float32)
            + params["ctc_head"]["b"]
        )
        ctc_len = enc.lengths
    return enc, ctc_logits, ctc_len


def forward_train(
    params,
    cfg: Seq2SeqConfig,
    feats: jnp.ndarray,
    feat_len: jnp.ndarray,
    labels_in: jnp.ndarray,  # [B, U] decoder inputs: [sos, l1, ..., l_{U-1}]
    rng: jax.Array | None,
    ss_prob: float | jnp.ndarray | None = None,
    train: bool = True,
    precomputed=None,  # encode(...) result, to share one encoder pass with
    # a decode in the same program (eval runs both; the encoder dominates)
) -> Seq2SeqOutput:
    """Teacher-forced unroll with scheduled sampling over the label axis.

    ``train=False`` (rng may be None) disables dropout: used for the dev
    teacher-forced NLL that the reference logged per epoch.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)  # consumed only by (inactive) sampling
    krng, drng, srng = jax.random.split(rng, 3)
    enc, ctc_logits, ctc_len = (
        precomputed if precomputed is not None
        else encode(params, cfg, feats, feat_len, train=train, rng=krng)
    )
    enc_out = enc.outputs
    enc_keys = precompute_keys(params["attention"], cfg.attention, enc_out)
    enc_mask = jnp.arange(enc_out.shape[1])[None, :] < enc.lengths[:, None]
    carry0 = _init_decoder_carry(cfg, enc_out)
    u = labels_in.shape[1]
    ss = cfg.scheduled_sampling_prob if ss_prob is None else ss_prob

    def body(state, inp):
        carry, prev_pred = state
        token_gold, key_d, key_s = inp
        use_model = jax.random.bernoulli(key_s, ss, token_gold.shape)
        token = jnp.where(use_model, prev_pred, token_gold)
        # fused=False here is a MEASURED decision (BASELINE.md round 3): the
        # differentiable fused read (location_attend_fused, custom VJP) made
        # this train step 1.9x SLOWER (70.3 vs 36.6 ms at B=32 T=400 H=512)
        # because under this scan's jax.checkpoint the program runs the
        # kernel forward twice (fwd + remat rebuild) AND the VJP's reference
        # recompute once, losing XLA's fwd->bwd residual sharing. The fused
        # read's 1.69x win is decode-only (greedy/beam paths use it).
        carry, logits = _decoder_step(
            params, cfg, enc_out, enc_keys, enc_mask, carry, token, key_d,
            train=train,
        )
        pred = jnp.argmax(logits, axis=-1)
        return (carry, pred), (logits, carry[3])

    keys_d = jax.random.split(drng, u)
    keys_s = jax.random.split(srng, u)
    prev0 = jnp.full((feats.shape[0],), cfg.sos_id, labels_in.dtype)
    (_, _), (logits, aligns) = jax.lax.scan(
        # remat: recompute decoder-step activations in the backward instead
        # of storing them (same trade as rnn.rnn_scan)
        jax.checkpoint(body), (carry0, prev0), (labels_in.swapaxes(0, 1), keys_d, keys_s)
    )
    return Seq2SeqOutput(
        logits.swapaxes(0, 1), aligns.swapaxes(0, 1),
        ctc_logits=ctc_logits, ctc_logit_len=ctc_len,
        enc_out=enc_out, enc_len=enc.lengths, aux_loss=enc.aux_loss,
    )


def decode_unroll_factor(max_len: int) -> int:
    """Steps per while_loop iteration for the early-exit decode loops.

    The round-5 beam phase profile (BASELINE.md, VERDICT r4 #3a) measured
    ~2.55 ms per while_loop iteration at shapes where the step's math is
    microseconds — per-iteration sequencing overhead of dozens of tiny
    kernels dominates the whole decode (98.7%). Running k steps per
    iteration amortizes that overhead ~k-fold. Bit-exactness is preserved
    because (a) k divides max_decode_length, so the loop can never run
    past max_len steps, and (b) steps past the all-finished point are
    provable no-ops (beam: EOS self-extension at +0 with stable top_k;
    greedy: buffer writes are gated on the live flag).
    """
    for k in (8, 7, 6, 5, 4, 3, 2):
        if max_len % k == 0:
            return k
    return 1


def greedy_decode(
    params, cfg: Seq2SeqConfig, feats, feat_len, max_len: int | None = None,
    precomputed=None, unroll: int | None = None,
) -> Seq2SeqOutput:
    """Argmax feedback decoding to ``max_decode_length`` with EOS masking."""
    enc, ctc_logits, ctc_len = (
        precomputed if precomputed is not None
        else encode(params, cfg, feats, feat_len, train=False)
    )
    enc_out = enc.outputs
    enc_keys = precompute_keys(params["attention"], cfg.attention, enc_out)
    enc_mask = jnp.arange(enc_out.shape[1])[None, :] < enc.lengths[:, None]
    b = feats.shape[0]
    max_len = max_len or cfg.max_decode_length

    # while_loop with an all-finished early exit (not a fixed-length scan):
    # typical hypotheses are several times shorter than max_decode_length,
    # and consumers only read rows below the first EOS (VERDICT r3 weak #4).
    # Outputs are preallocated time-major buffers; rows past the exit step
    # keep their fill (preds: EOS — same as the old eos-fed rows; logits/
    # aligns: zeros — the old scan carried real-but-unread values there).
    def body(state):
        si, carry, token, finished, logits_buf, preds_buf, aligns_buf = state
        # live: whether this step would have executed under unroll=1 (the
        # while condition is only checked every `unroll` steps). Dead steps
        # must leave the output buffers at their fill — preds' fill IS the
        # eos the masked argmax writes, but logits/aligns fills are zeros.
        live = ~jnp.all(finished)
        # fused=True: Pallas location-attention kernel (1.7x the XLA path;
        # inference only — the kernel defines no gradient)
        carry, logits = _decoder_step(
            params, cfg, enc_out, enc_keys, enc_mask, carry, token, fused=True
        )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pred = jnp.where(finished, cfg.eos_id, pred)
        finished = finished | (pred == cfg.eos_id)
        logits_buf = jax.lax.dynamic_update_index_in_dim(
            logits_buf, jnp.where(live, logits, jnp.zeros_like(logits)), si, 0)
        preds_buf = jax.lax.dynamic_update_index_in_dim(preds_buf, pred, si, 0)
        aligns_buf = jax.lax.dynamic_update_index_in_dim(
            aligns_buf, jnp.where(live, carry[3], jnp.zeros_like(carry[3])), si, 0)
        return (si + 1, carry, pred, finished, logits_buf, preds_buf, aligns_buf)

    k_unroll = unroll or decode_unroll_factor(max_len)
    if max_len % k_unroll:
        raise ValueError(f"unroll {k_unroll} must divide max_len {max_len}")

    def body_k(state):
        for _ in range(k_unroll):
            state = body(state)
        return state

    def not_done(state):
        si, finished = state[0], state[3]
        return jnp.logical_and(si < max_len, ~jnp.all(finished))

    # buffer dtypes follow the step's actual outputs (abstract eval, no
    # compute): hard-coding f32 would break the while_loop carry the moment a
    # bf16 decode path emits bf16 logits/alignments (ADVICE r4)
    carry0 = _init_decoder_carry(cfg, enc_out)
    token0 = jnp.full((b,), cfg.sos_id, jnp.int32)
    carry_s, logits_s = jax.eval_shape(
        lambda c, t: _decoder_step(
            params, cfg, enc_out, enc_keys, enc_mask, c, t, fused=True
        ),
        carry0, token0,
    )
    state0 = (
        jnp.zeros((), jnp.int32),
        carry0,
        token0,
        jnp.zeros((b,), bool),
        jnp.zeros((max_len, b, cfg.vocab), logits_s.dtype),
        jnp.full((max_len, b), cfg.eos_id, jnp.int32),
        jnp.zeros((max_len, b, enc_out.shape[1]), carry_s[3].dtype),
    )
    (_, _, _, _, logits, preds, aligns) = jax.lax.while_loop(not_done, body_k, state0)
    return Seq2SeqOutput(
        logits.swapaxes(0, 1), aligns.swapaxes(0, 1), preds.swapaxes(0, 1),
        ctc_logits=ctc_logits, ctc_logit_len=ctc_len,
        enc_out=enc_out, enc_len=enc.lengths,
    )
