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
    _reference_math,
    location_attend_fused,
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


def _fused_inputs(att_type="hybrid", seed=0):
    cfg = AttentionConfig(
        attention_type=att_type, attention_dim=16, conv_width=11,
        conv_num_channels=4, sharpening_factor=1.5,
    )
    enc_dim, dec_dim, b, t = 12, 10, 3, 40
    params = init_attention(jax.random.PRNGKey(seed), cfg, enc_dim, dec_dim)
    enc_out = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, enc_dim))
    dec_state = jax.random.normal(jax.random.PRNGKey(seed + 2), (b, dec_dim))
    prev_align = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(seed + 3), (b, t)), -1
    )
    enc_mask = jnp.asarray([[True] * t, [True] * (t - 7) + [False] * 7, [True] * t])
    keys = precompute_keys(params, cfg, enc_out)
    if "w_enc" in params:
        keys_in = keys + params["b"]
    else:
        keys_in = jnp.broadcast_to(params["b"], (b, t, cfg.attention_dim))
    q = jnp.matmul(dec_state, params["w_dec"])
    return cfg, params, (keys_in, enc_out, q, prev_align, enc_mask,
                         params["conv"], params["w_loc"], params["v"])


def test_reference_math_matches_kernel():
    """The VJP backward's XLA restatement must equal the kernel forward."""
    cfg, _, args = _fused_inputs()
    ctx_k, align_k = location_attend_pallas(
        *args, sharpening=cfg.sharpening_factor, interpret=True
    )
    ctx_r, align_r = _reference_math(*args, cfg.sharpening_factor)
    np.testing.assert_allclose(np.asarray(align_k), np.asarray(align_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx_k), np.asarray(ctx_r), atol=1e-5)


def test_fused_attention_grads_match_reference():
    """Grads through location_attend_fused == grads through plain XLA math.

    Training does not route here (measured 1.9x slower under the remat'd
    decoder scan — BASELINE.md round 3), but the fused read must stay safe
    to differentiate through wherever it appears; this pins the custom VJP
    to the autodiff of the unfused graph.
    """
    cfg, _, args = _fused_inputs()
    cw = jax.random.normal(jax.random.PRNGKey(9), args[1].shape[:1] + args[1].shape[2:])
    aw = jax.random.normal(jax.random.PRNGKey(10), args[3].shape)

    def loss_fused(keys_in, enc_out, q, prev_align, conv_w, w_loc, v):
        ctx, align = location_attend_fused(
            keys_in, enc_out, q, prev_align, args[4], conv_w, w_loc, v,
            cfg.sharpening_factor, True,  # interpret=True: kernel on CPU
        )
        return jnp.sum(ctx * cw) + jnp.sum(align * aw)

    def loss_ref(keys_in, enc_out, q, prev_align, conv_w, w_loc, v):
        ctx, align = _reference_math(
            keys_in, enc_out, q, prev_align, args[4], conv_w, w_loc, v,
            cfg.sharpening_factor,
        )
        return jnp.sum(ctx * cw) + jnp.sum(align * aw)

    diff_args = (args[0], args[1], args[2], args[3], args[5], args[6], args[7])
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*diff_args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*diff_args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-5)


def test_fused_attention_grads_under_checkpoint():
    """jax.checkpoint over the fused read (the training scan remats its
    body) must rebuild through the kernel without error and keep grads."""
    cfg, _, args = _fused_inputs()

    @jax.checkpoint
    def step(q, prev_align):
        ctx, align = location_attend_fused(
            args[0], args[1], q, prev_align, args[4], args[5], args[6],
            args[7], cfg.sharpening_factor, True,
        )
        return jnp.sum(ctx) + jnp.sum(align * align)

    g = jax.grad(step, argnums=(0, 1))(args[2], args[3])
    g_ref = jax.grad(
        lambda q, pa: jnp.sum(_reference_math(
            args[0], args[1], q, pa, args[4], args[5], args[6], args[7],
            cfg.sharpening_factor)[0])
        + jnp.sum(_reference_math(
            args[0], args[1], q, pa, args[4], args[5], args[6], args[7],
            cfg.sharpening_factor)[1] ** 2),
        argnums=(0, 1),
    )(args[2], args[3])
    for gf, gr in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-5)
