"""Cross-entropy with uniform label smoothing, joint-lambda mixing, weight decay.

Reference behaviour: attention models train with softmax cross-entropy over a
label mask plus uniform label smoothing (``attention_seq2seq.py:~compute_loss``),
joint models mix ``loss = λ·L_ctc + (1−λ)·L_att`` (``joint_ctc_attention.py``),
and all models add L2 weight decay inside ``compute_loss`` (SURVEY.md §2.2/§2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_mean(per_utt: jnp.ndarray, weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean over the batch axis, optionally weighted by per-row ``weight``.

    Short final batches are padded to full size with duplicate utterances
    (static shapes for XLA, ``data/dataset.py``); their rows carry
    ``weight=0`` so the training gradient is exactly the corpus
    distribution — without weights the duplicates would be counted twice.
    """
    if weight is None:
        return jnp.mean(per_utt)
    w = weight.astype(jnp.float32)
    return jnp.sum(per_utt * w) / jnp.maximum(jnp.sum(w), 1.0)


def smoothed_cross_entropy(
    logits: jnp.ndarray,  # [B, U, V]
    targets: jnp.ndarray,  # [B, U] int (may contain -1 padding)
    mask: jnp.ndarray,  # [B, U] 1.0 on real positions
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Mean-over-valid-tokens smoothed cross entropy, per utterance [B]."""
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.where(targets >= 0, targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        uniform = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)


def joint_loss(ctc_nll: jnp.ndarray, att_nll: jnp.ndarray, ctc_loss_weight: float):
    """λ·L_ctc + (1−λ)·L_att (Kim et al. 2017 / Hori et al. 2017)."""
    lam = ctc_loss_weight
    return lam * ctc_nll + (1.0 - lam) * att_nll


def l2_weight_decay(params, coeff: float) -> jnp.ndarray:
    """Sum of 0.5*||w||^2 over weight matrices (biases excluded, like tf losses)."""
    if coeff == 0.0:
        return jnp.asarray(0.0)
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(params):
        if leaf.ndim >= 2:  # weight matrices/kernels; 1-D biases exempt
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return coeff * total
