"""CTC acoustic models: encoder -> affine head -> blank-augmented logits.

Rebuilds ``models/ctc/ctc.py`` (class CTC) and ``models/ctc/multitask_ctc.py``
(hierarchical two-head CTC) from the reference (SURVEY.md §2.2) as pure
functions over parameter pytrees. Differences by design: logits stay
batch-major ``[B, T, C]`` (XLA prefers it; the reference transposed to
time-major for tf.nn.ctc_loss), there are no placeholders/sessions, and the
blank is the trailing class ``num_classes`` exactly as in the reference's
``num_classes + 1`` layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .encoders import EncoderConfig, EncoderOutput, apply_encoder, init_encoder


class CTCConfig(NamedTuple):
    encoder: EncoderConfig = EncoderConfig()
    num_classes: int = 61  # real units; blank is index num_classes
    bottleneck_dim: int | None = None
    # multitask (hierarchical) CTC head: sub-task classes. The loss mix
    # lives on the TASK config (train/ctc_task.py main_task_weight) — the
    # single place forward_loss reads; a duplicate field here was dead and
    # silently ignored when set.
    num_classes_sub: int | None = None

    @property
    def vocab_with_blank(self) -> int:
        return self.num_classes + 1

    @property
    def blank_id(self) -> int:
        return self.num_classes


class CTCOutput(NamedTuple):
    logits: jnp.ndarray  # [B, T', num_classes+1]
    logit_len: jnp.ndarray  # [B]
    sub_logits: jnp.ndarray | None = None
    sub_logit_len: jnp.ndarray | None = None
    aux_loss: jnp.ndarray | None = None  # MoE load-balance loss (weighted)


def _affine_init(key, din, dout, scale):
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (din, dout), jnp.float32, -scale, scale),
        "b": jnp.zeros((dout,), jnp.float32),
    }


def _affine(p, x):
    return jnp.matmul(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def init_ctc(key, cfg: CTCConfig, input_dim: int):
    kenc, khead, kbott, ksub = jax.random.split(key, 4)
    params = {"encoder": init_encoder(kenc, cfg.encoder, input_dim)}
    head_in = cfg.encoder.output_dim
    scale = cfg.encoder.parameter_init
    if cfg.bottleneck_dim:
        params["bottleneck"] = _affine_init(kbott, head_in, cfg.bottleneck_dim, scale)
        head_in = cfg.bottleneck_dim
    params["head"] = _affine_init(khead, head_in, cfg.vocab_with_blank, scale)
    if cfg.num_classes_sub is not None:
        if not cfg.encoder.is_multitask:
            raise ValueError("num_classes_sub requires a multitask_* encoder")
        params["sub_head"] = _affine_init(
            ksub, cfg.encoder.output_dim, cfg.num_classes_sub + 1, scale
        )
    return params


def apply_ctc(
    params,
    cfg: CTCConfig,
    feats: jnp.ndarray,
    feat_len: jnp.ndarray,
    train: bool = False,
    rng: jax.Array | None = None,
) -> CTCOutput:
    enc: EncoderOutput = apply_encoder(params["encoder"], cfg.encoder, feats, feat_len, train, rng)
    x = enc.outputs
    if cfg.bottleneck_dim:
        x = _affine(params["bottleneck"], x)
    logits = _affine(params["head"], x)
    sub_logits = sub_len = None
    if cfg.num_classes_sub is not None:
        if enc.sub_outputs is None:
            raise ValueError("encoder produced no sub-task tap")
        sub_logits = _affine(params["sub_head"], enc.sub_outputs)
        sub_len = enc.sub_lengths
    return CTCOutput(logits, enc.lengths, sub_logits, sub_len, enc.aux_loss)
