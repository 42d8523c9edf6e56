"""CTC task: device-side input pipeline + loss + jitted train/eval steps.

This is the TPU-native replacement for the reference's per-step
``sess.run([train_op, loss], feed_dict)`` pattern (``train_ctc.py`` do_train,
SURVEY.md §3.1): one jitted, donated function computes
frontend -> stacking -> splicing -> encoder -> CTC loss -> grads -> update
entirely on device; the host only feeds numpy batches and a scalar LR.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.frame_ops import splice_frames, stack_frames
from ..decoding.ctc_greedy import ctc_greedy_decode
from ..frontend.augment import SpecAugmentConfig, spec_augment
from ..frontend.features import FrontendConfig, extract_features
from ..models.ctc import CTCConfig, apply_ctc, init_ctc
from ..ops.ctc import ctc_loss
from ..ops.losses import batch_mean, l2_weight_decay
from .optimizer import apply_updates


class CTCTaskConfig(NamedTuple):
    model: CTCConfig
    frontend: FrontendConfig | None = FrontendConfig()  # None => precomputed features
    num_stack: int = 1
    num_skip: int = 1
    splice: int = 0
    weight_decay: float = 0.0
    ctc_impl: str = "auto"
    spec_augment: SpecAugmentConfig | None = None  # train-time masking hook
    # multitask (hierarchical) CTC
    main_task_weight: float = 1.0
    # per-frame dim of precomputed [T, D] features (frontend=None mode, the
    # reference's primary .npy input — SURVEY.md §2.6)
    feature_dim: int | None = None

    @property
    def input_dim(self) -> int:
        base = self.frontend.feature_dim if self.frontend else self.feature_dim
        if base is None:
            raise ValueError("precomputed-feature mode needs feature_dim set on the task config")
        return base * self.num_stack * (2 * self.splice + 1)


def device_pipeline(task: CTCTaskConfig, batch: dict):
    """Raw batch -> model-ready features, fully on device inside the jit.

    ``batch["cmvn_mean"]``/``batch["cmvn_inv_std"]`` present (per-speaker
    CMVN, SURVEY.md §2.9): base frames are normalized with the speaker's
    corpus-level stats before stacking/splicing; the frontend itself then
    runs with its own CMVN disabled (cmvn="speaker" is mask-only there).
    """
    inputs, input_len = batch["inputs"], batch["input_len"]
    if task.frontend is not None:
        feats, feat_len = extract_features(inputs, input_len, task.frontend)
    else:
        feats, feat_len = inputs, input_len
    if "cmvn_mean" in batch:
        t = feats.shape[1]
        mask = (jnp.arange(t)[None, :, None] < feat_len[:, None, None]).astype(feats.dtype)
        feats = (feats - batch["cmvn_mean"][:, None, :]) * batch["cmvn_inv_std"][:, None, :]
        feats = feats * mask
    feats, feat_len = stack_frames(feats, feat_len, task.num_stack, task.num_skip)
    feats = splice_frames(feats, task.splice)
    return feats, feat_len


def init_params(key, task: CTCTaskConfig, input_dim: int | None = None):
    return init_ctc(key, task.model, input_dim or task.input_dim)


def forward_loss(params, task: CTCTaskConfig, batch, train: bool, rng=None):
    feats, feat_len = device_pipeline(task, batch)
    if train and task.spec_augment is not None and rng is not None:
        rng, aug_rng = jax.random.split(rng)
        feats = spec_augment(aug_rng, feats, feat_len, task.spec_augment)
    out = apply_ctc(params, task.model, feats, feat_len, train=train, rng=rng)
    nll = ctc_loss(
        out.logits, out.logit_len, batch["labels"], batch["label_len"],
        blank_id=task.model.blank_id, impl=task.ctc_impl,
    )
    row_w = batch.get("weight")  # 0.0 on duplicate-fill rows of short batches
    loss = batch_mean(nll, row_w)
    aux = {"ctc_nll": loss}
    if out.sub_logits is not None:
        sub_nll = ctc_loss(
            out.sub_logits, out.sub_logit_len,
            batch["labels_sub"], batch["label_len_sub"],
            blank_id=task.model.num_classes_sub, impl=task.ctc_impl,
        )
        w = task.main_task_weight
        sub_mean = batch_mean(sub_nll, row_w)
        loss = w * loss + (1.0 - w) * sub_mean
        aux["ctc_nll_sub"] = sub_mean
    if out.aux_loss is not None and train:
        # MoE load-balance loss (already weighted in the encoder); train
        # only, so eval nll stays a pure data likelihood
        loss = loss + out.aux_loss
        aux["moe_aux"] = out.aux_loss
    if task.weight_decay:
        loss = loss + l2_weight_decay(params, task.weight_decay)
    aux["loss"] = loss
    return loss, aux


def make_train_step(task: CTCTaskConfig, optimizer, grad_accum: int = 1):
    """Jitted, buffer-donated (params, opt_state, batch, lr, rng) -> updated.

    ``grad_accum > 1`` scans the batch in microbatches and averages the
    gradients before the single update (``train/accum.py``) — activation
    memory at B/A, full-batch update math.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, lr, rng):
        if grad_accum > 1:
            from .accum import accum_value_and_grad

            (loss, aux), grads = accum_value_and_grad(
                lambda p, mb, r: forward_loss(p, task, mb, train=True, rng=r),
                params, batch, rng, grad_accum,
            )
        else:
            (loss, aux), grads = jax.value_and_grad(
                lambda p: forward_loss(p, task, batch, train=True, rng=rng), has_aux=True
            )(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = apply_updates(params, updates, lr)
        # NaN guard (SURVEY.md §5.2): a non-finite loss skips the update
        # instead of poisoning the weights
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


def make_eval_step(task: CTCTaskConfig):
    """Jitted greedy-decode step: batch -> (decoded [B,T'], lengths, nll)."""

    @jax.jit
    def eval_step(params, batch):
        feats, feat_len = device_pipeline(task, batch)
        out = apply_ctc(params, task.model, feats, feat_len, train=False)
        nll = ctc_loss(
            out.logits, out.logit_len, batch["labels"], batch["label_len"],
            blank_id=task.model.blank_id, impl=task.ctc_impl, need_grad=False,
        )
        decoded, dec_len = ctc_greedy_decode(out.logits, out.logit_len, task.model.blank_id)
        return decoded, dec_len, nll

    return eval_step


def make_beam_eval_step(task: CTCTaskConfig, beam_width: int, top_k_classes: int = 16,
                        lm=None, lm_weight: float = 0.0):
    """Eval step decoding with the on-device CTC prefix beam (reference
    eval used tf.nn.ctc_beam_search_decoder at config beam_width).

    ``lm``: (lm_params, LMConfig) enables carried-state shallow fusion.
    """
    from ..decoding.ctc_prefix_beam import ctc_prefix_beam_search

    fusion_lm = None
    if lm is not None and lm_weight:
        from ..models.lm import make_fusion_lm

        lm_params, lm_cfg = lm
        fusion_lm = make_fusion_lm(
            lm_params, lm_cfg, sos_id=lm_cfg.vocab - 2,
            num_ctc_classes=task.model.vocab_with_blank,
        )

    @jax.jit
    def eval_step(params, batch):
        feats, feat_len = device_pipeline(task, batch)
        out = apply_ctc(params, task.model, feats, feat_len, train=False)
        nll = ctc_loss(
            out.logits, out.logit_len, batch["labels"], batch["label_len"],
            blank_id=task.model.blank_id, impl=task.ctc_impl, need_grad=False,
        )
        prefixes, lengths, _ = ctc_prefix_beam_search(
            out.logits, out.logit_len, task.model.blank_id,
            beam_width=beam_width, top_k_classes=top_k_classes,
            fusion_lm=fusion_lm, lm_weight=lm_weight if fusion_lm else 0.0,
        )
        return prefixes[:, 0], lengths[:, 0], nll

    return eval_step
