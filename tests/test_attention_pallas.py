"""Fused location-attention Pallas kernel vs the jnp attend() (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_end2end_speech_recognition_tpu.models.attention import (
    AttentionConfig,
    attend,
    init_attention,
    precompute_keys,
)
from tensorflow_end2end_speech_recognition_tpu.ops.pallas.attention_kernel import (
    location_attend_pallas,
)


@pytest.mark.parametrize("att_type", ["hybrid", "location"])
def test_pallas_attention_matches_attend(att_type):
    cfg = AttentionConfig(
        attention_type=att_type, attention_dim=16, conv_width=11,
        conv_num_channels=4, sharpening_factor=1.5,
    )
    enc_dim, dec_dim, b, t = 12, 10, 3, 40
    params = init_attention(jax.random.PRNGKey(0), cfg, enc_dim, dec_dim)
    enc_out = jax.random.normal(jax.random.PRNGKey(1), (b, t, enc_dim))
    dec_state = jax.random.normal(jax.random.PRNGKey(2), (b, dec_dim))
    prev_align = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (b, t)), -1)
    enc_mask = jnp.asarray([[True] * t, [True] * (t - 7) + [False] * 7, [True] * t])

    keys = precompute_keys(params, cfg, enc_out)
    ctx_ref, align_ref = attend(params, cfg, enc_out, keys, enc_mask, dec_state, prev_align)

    if "w_enc" in params:  # hybrid: content term present
        keys_in = keys + params["b"]
    else:  # pure location: bias only
        keys_in = jnp.broadcast_to(params["b"], (b, t, cfg.attention_dim))
    q = jnp.matmul(dec_state, params["w_dec"])
    ctx_p, align_p = location_attend_pallas(
        keys_in, enc_out, q, prev_align, enc_mask,
        params["conv"], params["w_loc"], params["v"],
        sharpening=cfg.sharpening_factor, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(align_p), np.asarray(align_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_ref), atol=1e-5)
