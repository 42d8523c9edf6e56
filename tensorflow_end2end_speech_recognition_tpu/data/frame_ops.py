"""Frame stacking (Sak et al. 2015) and context splicing, as fused jnp ops.

Reference behaviour: ``utils/io/inputs/frame_stacking.py`` (stack ``num_stack``
consecutive frames, hop ``num_skip`` — e.g. 3/3 gives 3x shorter, 3x wider
inputs) and ``utils/io/inputs/splice.py`` (concatenate a +/-``splice`` frame
context window per frame). There they are per-utterance numpy loops on the
host; here both are static-shape gathers over ``[B, T, D]`` batches that live
inside the jitted input pipeline, so they fuse with the frontend.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def stack_frames(feats: jnp.ndarray, feat_len: jnp.ndarray, num_stack: int, num_skip: int):
    """[B, T, D] -> [B, ceil(T/num_skip), D*num_stack] plus new lengths.

    Window t covers input frames [t*num_skip, t*num_skip + num_stack); frames
    past T are zero (they are already zero-padded upstream).
    """
    if num_stack == 1 and num_skip == 1:
        return feats, feat_len
    b, t, d = feats.shape
    t_out = -(-t // num_skip)
    pad = t_out * num_skip + num_stack - t
    feats = jnp.pad(feats, ((0, 0), (0, max(pad, 0)), (0, 0)))
    idx = np.arange(t_out)[:, None] * num_skip + np.arange(num_stack)[None, :]
    stacked = feats[:, idx, :].reshape(b, t_out, num_stack * d)
    new_len = -(-feat_len // num_skip)  # ceil division, traced-safe
    return stacked, new_len


def splice_frames(feats: jnp.ndarray, splice: int):
    """[B, T, D] -> [B, T, D*(2*splice+1)] context windows (zero edge pad)."""
    if splice == 0:
        return feats
    b, t, d = feats.shape
    padded = jnp.pad(feats, ((0, 0), (splice, splice), (0, 0)))
    idx = np.arange(t)[:, None] + np.arange(2 * splice + 1)[None, :]
    return padded[:, idx, :].reshape(b, t, (2 * splice + 1) * d)
