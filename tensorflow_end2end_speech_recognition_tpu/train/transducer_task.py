"""Transducer task: device pipeline + RNN-T loss + jitted train/eval steps.

Mirrors ``ctc_task.py``'s contract (the train loop and eval harness are
task-agnostic): one jitted, donated step runs frontend -> stacking ->
encoder -> prediction net -> lattice loss -> grads -> update on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..decoding.transducer_greedy import transducer_greedy_decode
from ..frontend.augment import SpecAugmentConfig, spec_augment
from ..frontend.features import FrontendConfig
from ..models.transducer import TransducerConfig, encode, init_transducer, predict
from ..ops.losses import batch_mean, l2_weight_decay
from ..ops.transducer import rnnt_loss
from .ctc_task import device_pipeline
from .optimizer import apply_updates


class TransducerTaskConfig(NamedTuple):
    model: TransducerConfig
    frontend: FrontendConfig | None = FrontendConfig()
    num_stack: int = 1
    num_skip: int = 1
    splice: int = 0
    weight_decay: float = 0.0
    spec_augment: SpecAugmentConfig | None = None
    feature_dim: int | None = None  # precomputed-feature mode

    @property
    def input_dim(self) -> int:
        base = self.frontend.feature_dim if self.frontend else self.feature_dim
        if base is None:
            raise ValueError("precomputed-feature mode needs feature_dim set on the task config")
        return base * self.num_stack * (2 * self.splice + 1)


def init_params(key, task: TransducerTaskConfig, input_dim: int | None = None):
    return init_transducer(key, task.model, input_dim or task.input_dim)


def forward_loss(params, task: TransducerTaskConfig, batch, train: bool, rng=None):
    cfg = task.model
    feats, feat_len = device_pipeline(task, batch)
    if train and task.spec_augment is not None and rng is not None:
        rng, aug_rng = jax.random.split(rng)
        feats = spec_augment(aug_rng, feats, feat_len, task.spec_augment)
    enc_rng = pred_rng = None
    if rng is not None:
        rng, enc_rng, pred_rng = jax.random.split(rng, 3)
    out = encode(params, cfg, feats, feat_len, train=train, rng=enc_rng)

    labels, label_len = batch["labels"], batch["label_len"]
    # prediction-net input: [SOS(blank), y_1 .. y_U]
    tokens = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), cfg.blank_id, labels.dtype),
         jnp.where(labels >= 0, labels, cfg.blank_id)],
        axis=1,
    )
    g_proj, _ = predict(params, cfg, tokens, train=train, rng=pred_rng)

    nll = rnnt_loss(
        out.f_proj, g_proj, params["out"]["w"], params["out"]["b"],
        labels, out.enc_len, label_len, cfg.blank_id,
    )
    loss = batch_mean(nll, batch.get("weight"))
    aux = {"rnnt_nll": loss}
    if out.aux_loss is not None and train:
        # MoE load-balance loss (weighted in the encoder); train only
        loss = loss + out.aux_loss
        aux["moe_aux"] = out.aux_loss
    if task.weight_decay:
        loss = loss + l2_weight_decay(params, task.weight_decay)
    aux["loss"] = loss
    return loss, aux


def make_train_step(task: TransducerTaskConfig, optimizer, grad_accum: int = 1):
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
        # NaN guard + clamped-impossible-lattice guard (as ctc_task)
        ok = jnp.isfinite(loss) & (loss < 1e20)
        params = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_params, params)
        opt_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state)
        aux["nonfinite"] = jnp.logical_not(ok)
        return params, opt_state, aux

    return train_step


def _teacher_nll(params, cfg, out, batch):
    labels, label_len = batch["labels"], batch["label_len"]
    tokens = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), cfg.blank_id, labels.dtype),
         jnp.where(labels >= 0, labels, cfg.blank_id)],
        axis=1,
    )
    g_proj, _ = predict(params, cfg, tokens)
    return rnnt_loss(
        out.f_proj, g_proj, params["out"]["w"], params["out"]["b"],
        labels, out.enc_len, label_len, cfg.blank_id,
    )


def make_eval_step(task: TransducerTaskConfig):
    """Jitted greedy-decode step: batch -> (decoded, lengths, nll)."""
    cfg = task.model

    @jax.jit
    def eval_step(params, batch):
        feats, feat_len = device_pipeline(task, batch)
        out = encode(params, cfg, feats, feat_len, train=False)
        nll = _teacher_nll(params, cfg, out, batch)
        decoded, dec_len = transducer_greedy_decode(params, cfg, out.f_proj, out.enc_len)
        return decoded, dec_len, nll

    return eval_step


def make_beam_eval_step(task: TransducerTaskConfig, beam_width: int,
                        lm=None, lm_weight: float = 0.0):
    """Eval step decoding with the time-synchronous transducer beam.

    The third output stays the teacher-forced transducer nll (not the beam
    score), so bin/eval's ``loss`` column means the same thing across
    greedy/beam runs. ``lm``: (lm_params, LMConfig) enables carried-state
    shallow fusion on label emissions (decoding/transducer_beam.py) — the
    external LM complements the label-context prediction network the same
    way the reference fused an RNN-LM over the attention decoder's
    internal model (SURVEY.md §2.10).
    """
    from ..decoding.transducer_beam import transducer_beam_search

    cfg = task.model
    fusion_lm = None
    if lm is not None and lm_weight:
        from ..models.lm import make_fusion_lm

        lm_params, lm_cfg = lm
        # vocab_with_blank lays out units then blank LAST — the same class
        # layout the CTC adapter maps the LM onto, so it is reused verbatim
        fusion_lm = make_fusion_lm(
            lm_params, lm_cfg, sos_id=lm_cfg.vocab - 2,
            num_ctc_classes=cfg.vocab_with_blank,
        )

    @jax.jit
    def eval_step(params, batch):
        feats, feat_len = device_pipeline(task, batch)
        out = encode(params, cfg, feats, feat_len, train=False)
        nll = _teacher_nll(params, cfg, out, batch)
        res = transducer_beam_search(
            params, cfg, out.f_proj, out.enc_len, beam_width=beam_width,
            fusion_lm=fusion_lm, lm_weight=lm_weight,
        )
        return res.tokens[:, 0], res.lengths[:, 0], nll

    return eval_step
