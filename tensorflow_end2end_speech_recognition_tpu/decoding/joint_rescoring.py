"""Joint CTC-attention beam rescoring (Hori et al. 2017, PAPERS.md #5).

The reference decoded joint models with attention-only beam scoring
(SURVEY.md §2.3 marks in-repo rescoring as uncertain); BASELINE.json names
joint rescoring explicitly, so it is first-class here: each attention beam
hypothesis gets a CTC log-likelihood computed with the same on-device
forward recursion used for training (``ops.ctc.ctc_loss`` vmapped over the
beam axis), and the final ranking uses

    score = (1 - λ) * logP_att + λ * logP_ctc   (+ optional LM, length norm)

entirely on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ctc import ctc_loss
from .attention_beam import BeamSearchResult


def joint_rescore(
    result: BeamSearchResult,
    ctc_weight: float,
    blank_id: int,
    length_penalty: float = 0.0,
) -> BeamSearchResult:
    """Re-rank attention beams with the joint CTC-attention score."""
    if result.ctc_logits is None:
        raise ValueError("beam result has no CTC head outputs; model is not joint")
    b, w, u = result.tokens.shape

    def per_beam(logits_b, len_b, hyp_b, hyp_len_b):
        # vmap over the beam axis: one CTC forward per hypothesis
        return -ctc_loss(
            jnp.broadcast_to(logits_b[None], (w,) + logits_b.shape),
            jnp.broadcast_to(len_b[None], (w,)),
            hyp_b,
            hyp_len_b,
            blank_id=blank_id,
            need_grad=False,  # rescoring never differentiates
        )

    ctc_lp = jax.vmap(per_beam)(
        result.ctc_logits, result.ctc_logit_len, result.tokens, result.lengths
    )  # [B, W]

    # raw_scores = att + lm_weight*logP_lm from the beam (attention_beam.py),
    # so the difference recovers the weighted LM term — it must survive the
    # re-ranking (Hori et al.: (1-λ)·att + λ·ctc + β·lm), not be discarded
    lm_term = result.raw_scores - result.att_scores
    joint = (1.0 - ctc_weight) * result.att_scores + ctc_weight * ctc_lp + lm_term
    norm = ((5.0 + result.lengths.astype(jnp.float32)) / 6.0) ** length_penalty
    final = joint / jnp.maximum(norm, 1e-6)
    order = jnp.argsort(-final, axis=1)
    take = lambda x: jnp.take_along_axis(x, order, axis=1)
    return BeamSearchResult(
        tokens=jnp.take_along_axis(result.tokens, order[..., None], axis=1),
        lengths=take(result.lengths),
        scores=take(final),
        raw_scores=take(result.raw_scores),
        att_scores=take(result.att_scores),
        ctc_logits=result.ctc_logits,
        ctc_logit_len=result.ctc_logit_len,
    )
