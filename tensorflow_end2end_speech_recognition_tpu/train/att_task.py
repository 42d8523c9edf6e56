"""Attention / joint CTC-attention task: loss + jitted train/eval steps.

Mirrors ``ctc_task.py`` for the seq2seq models (reference train_attention.py
do_train, SURVEY.md §3.2): label smoothing cross-entropy over the masked
label axis, optional joint CTC term (λ mix), scheduled-sampling probability
ramped by global step — all inside one donated jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.seq2seq import Seq2SeqConfig, forward_train, greedy_decode, init_seq2seq
from ..ops.ctc import ctc_loss
from ..ops.losses import batch_mean, joint_loss, l2_weight_decay, smoothed_cross_entropy
from .ctc_task import device_pipeline
from .optimizer import apply_updates
from ..frontend.augment import SpecAugmentConfig, spec_augment
from ..frontend.features import FrontendConfig


class AttTaskConfig(NamedTuple):
    model: Seq2SeqConfig
    frontend: FrontendConfig | None = FrontendConfig()
    num_stack: int = 1
    num_skip: int = 1
    splice: int = 0
    weight_decay: float = 0.0
    label_smoothing: float = 0.0
    ctc_impl: str = "auto"
    scheduled_sampling_ramp_max_step: int = 0
    spec_augment: SpecAugmentConfig | None = None
    # guided attention (Tachibana et al. 2017, arXiv 1710.08969): penalize
    # attention mass off the monotonic diagonal so the alignment emerges in
    # tens of updates instead of thousands; annealed to zero (train only)
    guided_attention_weight: float = 0.0
    guided_attention_sigma: float = 0.2
    guided_attention_decay_steps: int = 0
    # joint models: anneal λ from ctc_weight_init down to
    # model.ctc_loss_weight over ctc_weight_anneal_steps (None = static λ)
    ctc_weight_init: float | None = None
    ctc_weight_anneal_steps: int = 0
    # per-frame dim of precomputed [T, D] features (frontend=None mode, the
    # reference's primary .npy input — SURVEY.md §2.6)
    feature_dim: int | None = None

    @property
    def input_dim(self) -> int:
        base = self.frontend.feature_dim if self.frontend else self.feature_dim
        if base is None:
            raise ValueError("precomputed-feature mode needs feature_dim set on the task config")
        return base * self.num_stack * (2 * self.splice + 1)


def init_params(key, task: AttTaskConfig, input_dim: int | None = None):
    return init_seq2seq(key, task.model, input_dim or task.input_dim)


def make_decoder_io(cfg: Seq2SeqConfig, labels: jnp.ndarray, label_len: jnp.ndarray):
    """labels [B,U] (-1 pad) -> (labels_in [B,U+1], targets [B,U+1], mask).

    ``labels_in`` = [<sos>, l1..lU] (pad filled with <eos>); ``targets`` =
    [l1..lU, <eos> at position label_len]; mask covers label_len+1 positions.
    """
    b, u = labels.shape
    safe = jnp.where(labels >= 0, labels, cfg.eos_id)
    labels_in = jnp.concatenate(
        [jnp.full((b, 1), cfg.sos_id, labels.dtype), safe], axis=1
    )
    pos = jnp.arange(u + 1)[None, :]
    targets = jnp.concatenate([safe, jnp.full((b, 1), cfg.eos_id, labels.dtype)], axis=1)
    targets = jnp.where(pos == label_len[:, None], cfg.eos_id, targets)
    mask = pos <= label_len[:, None]
    targets = jnp.where(mask, targets, -1)
    return labels_in, targets, mask.astype(jnp.float32)


def scheduled_sampling_prob(task: AttTaskConfig, step):
    base = task.model.scheduled_sampling_prob
    ramp = task.scheduled_sampling_ramp_max_step
    if base == 0.0:
        return 0.0
    if ramp <= 0:
        return base
    return base * jnp.minimum(step / ramp, 1.0)


def guided_attention_penalty(att_w, label_mask, enc_len, sigma):
    """Per-utterance guided-attention penalty (Tachibana et al. 2017).

    ``att_w`` [B, U, T] are the decoder's attention rows (each sums to 1
    over valid t); the penalty is the attention mass weighted by how far
    (t/T, u/U) sits from the monotonic diagonal: w = 1 - exp(-(t/T - u/U)^2
    / (2 sigma^2)). A perfectly diagonal alignment scores ~0; a flat or
    wandering one scores ~1. Returns [B] means over valid label positions.
    """
    b, u_dim, t_dim = att_w.shape
    upos = jnp.arange(u_dim, dtype=jnp.float32)[None, :, None]
    tpos = jnp.arange(t_dim, dtype=jnp.float32)[None, None, :]
    ulen = jnp.maximum(jnp.sum(label_mask, axis=1), 1.0)[:, None, None]
    tlen = jnp.maximum(enc_len.astype(jnp.float32), 1.0)[:, None, None]
    off_diag = 1.0 - jnp.exp(
        -0.5 * jnp.square(tpos / tlen - upos / ulen) / (sigma * sigma)
    )
    pen = att_w * off_diag * (tpos < tlen) * label_mask[:, :, None]
    return jnp.sum(pen, axis=(1, 2)) / jnp.maximum(jnp.sum(label_mask, axis=1), 1.0)


def ga_weight_schedule(task: AttTaskConfig, step):
    """Annealed guided-attention weight: linear decay to 0 (train only)."""
    w = task.guided_attention_weight
    if w == 0.0:
        return 0.0
    if task.guided_attention_decay_steps <= 0:
        return w
    return w * jnp.maximum(0.0, 1.0 - step / task.guided_attention_decay_steps)


def ctc_lambda(task: AttTaskConfig, step):
    """Joint-loss λ, optionally annealed from ctc_weight_init."""
    lam = task.model.ctc_loss_weight
    if task.ctc_weight_init is None or task.ctc_weight_anneal_steps <= 0:
        return lam
    frac = jnp.minimum(step / task.ctc_weight_anneal_steps, 1.0)
    return task.ctc_weight_init + frac * (lam - task.ctc_weight_init)


def forward_loss(params, task: AttTaskConfig, batch, train: bool, rng, step=0):
    cfg = task.model
    feats, feat_len = device_pipeline(task, batch)
    if train and task.spec_augment is not None and rng is not None:
        rng, aug_rng = jax.random.split(rng)
        feats = spec_augment(aug_rng, feats, feat_len, task.spec_augment)
    labels_in, targets, mask = make_decoder_io(cfg, batch["labels"], batch["label_len"])
    out = forward_train(
        params, cfg, feats, feat_len, labels_in, rng,
        ss_prob=scheduled_sampling_prob(task, step) if train else 0.0,
        train=train,  # eval-mode NLL must not be perturbed by dropout
    )
    row_w = batch.get("weight")  # 0.0 on duplicate-fill rows of short batches
    att_nll = batch_mean(
        smoothed_cross_entropy(out.logits, targets, mask, task.label_smoothing), row_w
    )
    aux = {"att_nll": att_nll}
    loss = att_nll
    if cfg.is_joint:
        ctc_nll = batch_mean(
            ctc_loss(
                out.ctc_logits, out.ctc_logit_len, batch["labels"], batch["label_len"],
                blank_id=cfg.num_classes, impl=task.ctc_impl,
            ),
            row_w,
        )
        aux["ctc_nll"] = ctc_nll
        loss = joint_loss(ctc_nll, att_nll,
                          ctc_lambda(task, step) if train else cfg.ctc_loss_weight)
    # guided attention is added AFTER the joint mix: the joint branch
    # replaces the base loss with λ·ctc + (1-λ)·att, and adding the penalty
    # before it silently dropped the term for joint models (round-4 bug:
    # every joint guided-attention arm equaled its baseline bit-for-bit)
    if train and task.guided_attention_weight > 0.0:
        ga = batch_mean(
            guided_attention_penalty(
                out.attention_weights, mask, out.enc_len,
                task.guided_attention_sigma,
            ),
            row_w,
        )
        aux["guided_att"] = ga
        loss = loss + ga_weight_schedule(task, step) * ga
    if out.aux_loss is not None and train:
        # MoE load-balance loss (weighted in the encoder); train only
        loss = loss + out.aux_loss
        aux["moe_aux"] = out.aux_loss
    if task.weight_decay:
        loss = loss + l2_weight_decay(params, task.weight_decay)
    aux["loss"] = loss
    return loss, aux


def make_train_step(task: AttTaskConfig, optimizer, grad_accum: int = 1):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, lr, rng, step):
        if grad_accum > 1:
            from .accum import accum_value_and_grad

            (loss, aux), grads = accum_value_and_grad(
                lambda p, mb, r: forward_loss(p, task, mb, train=True,
                                              rng=r, step=step),
                params, batch, rng, grad_accum,
            )
        else:
            (loss, aux), grads = jax.value_and_grad(
                lambda p: forward_loss(p, task, batch, train=True, rng=rng, step=step),
                has_aux=True,
            )(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = apply_updates(params, updates, lr)
        # also reject clamped impossible-alignment losses (~1e30): they are
        # finite but their gradients are garbage
        ok = jnp.isfinite(loss) & (loss < 1e20)
        params = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_params, params)
        # the optimizer state must be rolled back too: one NaN gradient would
        # otherwise poison Adam/RMSProp moments permanently
        opt_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state)
        aux["nonfinite"] = jnp.logical_not(ok)
        return params, opt_state, aux

    return train_step


def make_eval_step(task: AttTaskConfig):
    """Greedy decode + teacher-forced nll for dev tracking."""

    @jax.jit
    def eval_step(params, batch):
        cfg = task.model
        feats, feat_len = device_pipeline(task, batch)
        # ONE encoder pass shared by the greedy decode and the
        # teacher-forced NLL (the encoder dominates eval cost)
        from ..models.seq2seq import encode

        pre = encode(params, cfg, feats, feat_len, train=False)
        out = greedy_decode(params, cfg, feats, feat_len, precomputed=pre)
        # predicted_ids are eos-filled after finish; length = first-eos index
        preds = out.predicted_ids
        is_eos = preds == cfg.eos_id
        seen = jnp.cumsum(is_eos, axis=1) > 0
        dec_len = jnp.sum(~seen, axis=1)
        preds = jnp.where(seen, -1, preds)
        # per-utterance teacher-forced dev NLL (no sampling, no dropout) so
        # metrics.csv/summary report a real loss for attention runs
        labels_in, targets, mask = make_decoder_io(cfg, batch["labels"], batch["label_len"])
        tf_out = forward_train(
            params, cfg, feats, feat_len, labels_in, rng=None, ss_prob=0.0,
            train=False, precomputed=pre,
        )
        nll = smoothed_cross_entropy(tf_out.logits, targets, mask, 0.0)
        return preds, dec_len, nll

    return eval_step


def make_beam_eval_step(task: AttTaskConfig, beam_width: int, length_penalty: float = 0.0,
                        joint_rescore_weight: float | None = None,
                        lm=None, lm_weight: float = 0.0):
    """Eval step decoding with the batched attention beam (+ optional joint
    CTC-attention rescoring for joint models; ``lm=(params, LMConfig)``
    enables shallow fusion)."""
    from ..decoding.attention_beam import attention_beam_search
    from ..decoding.joint_rescoring import joint_rescore as _rescore

    cfg = task.model
    lm_params, lm_cfg = lm if lm is not None else (None, None)

    @jax.jit
    def eval_step(params, batch):
        from ..models.seq2seq import encode

        feats, feat_len = device_pipeline(task, batch)
        # ONE encoder pass shared by the beam and the teacher-forced NLL
        pre = encode(params, cfg, feats, feat_len, train=False)
        result = attention_beam_search(
            params, cfg, feats, feat_len,
            beam_width=beam_width, length_penalty=length_penalty,
            lm_params=lm_params, lm_cfg=lm_cfg,
            lm_weight=lm_weight if lm_params is not None else 0.0,
            precomputed=pre,
        )
        if joint_rescore_weight is not None and cfg.is_joint:
            result = _rescore(result, joint_rescore_weight, cfg.num_classes, length_penalty)
        # report the same quantity as the greedy eval step (teacher-forced
        # per-utterance NLL), NOT the beam score — so bin/eval.py's "loss"
        # column means the same thing across greedy/beam runs (VERDICT r2 #9)
        labels_in, targets, mask = make_decoder_io(cfg, batch["labels"], batch["label_len"])
        tf_out = forward_train(
            params, cfg, feats, feat_len, labels_in, rng=None, ss_prob=0.0,
            train=False, precomputed=pre,
        )
        nll = smoothed_cross_entropy(tf_out.logits, targets, mask, 0.0)
        return result.tokens[:, 0], result.lengths[:, 0], nll

    return eval_step
