"""RNN-LM training task (for shallow fusion / rescoring).

The reference's LibriSpeech-960 recipe fused an externally trained RNN-LM at
decode time (BASELINE.json config #5); here the LM is first-class: trained
on transcripts with the same loop conventions, checkpointed with orbax, and
consumed by ``decoding.attention_beam`` / ``decoding.ctc_prefix_beam``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.lm import LMConfig, init_lm, lm_sequence_nll
from .optimizer import apply_updates


class LMTaskConfig(NamedTuple):
    model: LMConfig
    weight_decay: float = 0.0


def init_params(key, task: LMTaskConfig):
    return init_lm(key, task.model)


def make_train_step(task: LMTaskConfig, optimizer):
    cfg = task.model

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, lr, rng):
        def loss_fn(p):
            nll = lm_sequence_nll(
                p, cfg, batch["labels"], batch["label_len"], sos_id=cfg.vocab - 2
            )
            w = batch.get("weight")  # 0.0 on duplicate-fill rows
            if w is not None:
                nll = nll * w
                # supervised steps per row = label_len + 1 (the <eos> step)
                tokens = jnp.sum((batch["label_len"] + 1) * w)
            else:
                tokens = jnp.sum(batch["label_len"] + 1)
            return jnp.sum(nll) / jnp.maximum(tokens, 1)  # per-token nll

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = apply_updates(params, updates, lr)
        ok = jnp.isfinite(loss) & (loss < 1e20)
        params = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_params, params)
        # the optimizer state must be rolled back too: one NaN gradient would
        # otherwise poison Adam moments permanently (same guard as ctc_task)
        opt_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state)
        return params, opt_state, {"loss": loss, "ppl": jnp.exp(loss)}

    return train_step


def make_eval_step(task: LMTaskConfig):
    cfg = task.model

    @jax.jit
    def eval_step(params, batch):
        nll = lm_sequence_nll(
            params, cfg, batch["labels"], batch["label_len"], sos_id=cfg.vocab - 2
        )
        w = batch.get("weight")
        if w is not None:
            # duplicate-fill rows carry weight 0; the token count matches the
            # nll's supervised steps (label_len + 1: incl. the <eos> step) so
            # perplexity is exp(nll per supervised token), not overstated
            return jnp.sum(nll * w), jnp.sum((batch["label_len"] + 1) * w)
        return jnp.sum(nll), jnp.sum(batch["label_len"] + 1)

    return eval_step
