"""SpecAugment-style on-device feature augmentation.

The reference has no augmentation (its features are precomputed offline);
this is the hook SURVEY.md §7 calls for. Pure jnp, static shapes, driven by
a JAX PRNG key so it lives inside the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SpecAugmentConfig(NamedTuple):
    freq_mask_width: int = 8
    num_freq_masks: int = 2
    time_mask_frac: float = 0.05  # each time mask <= frac * valid length
    num_time_masks: int = 2


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,
    feat_len: jnp.ndarray,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> jnp.ndarray:
    """feats: [B, T, D]; feat_len: [B]. Returns masked features."""
    b, t, d = feats.shape
    time_idx = jnp.arange(t)[None, :, None]  # [1, T, 1]
    freq_idx = jnp.arange(d)[None, None, :]  # [1, 1, D]
    keep = jnp.ones((b, t, d), dtype=feats.dtype)

    keys = jax.random.split(key, cfg.num_freq_masks + cfg.num_time_masks)
    for i in range(cfg.num_freq_masks):
        k0, k1 = jax.random.split(keys[i])
        width = jax.random.randint(k0, (b, 1, 1), 0, cfg.freq_mask_width + 1)
        # start may reach d - F (so start + width <= d covers the top bin);
        # an exclusive bound of d - F left the highest bin never masked
        start = jax.random.randint(k1, (b, 1, 1), 0, max(d - cfg.freq_mask_width, 0) + 1)
        keep = keep * jnp.where(
            (freq_idx >= start) & (freq_idx < start + width), 0.0, 1.0
        )
    for i in range(cfg.num_time_masks):
        k0, k1 = jax.random.split(keys[cfg.num_freq_masks + i])
        max_w = jnp.maximum(
            (feat_len.astype(jnp.float32) * cfg.time_mask_frac).astype(jnp.int32), 1
        )[:, None, None]
        # per-row bound is traced, so sample via uniform * (bound+1) — this
        # is exactly uniform over {0..max_w} (randint can't take traced
        # bounds, and `randint(0, t) % (max_w+1)` skews small widths)
        width = jnp.floor(
            jax.random.uniform(k0, (b, 1, 1)) * (max_w + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        # start within the valid region (paper behaviour: masks land on
        # real frames, not padding)
        lo = jnp.maximum(feat_len[:, None, None] - width + 1, 1).astype(jnp.float32)
        start = jnp.floor(jax.random.uniform(k1, (b, 1, 1)) * lo).astype(jnp.int32)
        keep = keep * jnp.where(
            (time_idx >= start) & (time_idx < start + width), 0.0, 1.0
        )
    return feats * keep
