"""Attention scorer oracle tests + seq2seq forward/greedy shape & convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_end2end_speech_recognition_tpu.models.attention import (
    ATTENTION_TYPES,
    AttentionConfig,
    attend,
    init_attention,
    precompute_keys,
)
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import (
    Seq2SeqConfig,
    forward_train,
    greedy_decode,
    init_seq2seq,
)
from tensorflow_end2end_speech_recognition_tpu.train.att_task import make_decoder_io


@pytest.mark.parametrize("att_type", ATTENTION_TYPES)
def test_attention_scorers(att_type):
    cfg = AttentionConfig(attention_type=att_type, attention_dim=8, conv_width=5, conv_num_channels=3)
    enc_dim, dec_dim = 10, 6
    params = init_attention(jax.random.PRNGKey(0), cfg, enc_dim, dec_dim)
    b, t = 2, 7
    enc_out = jax.random.normal(jax.random.PRNGKey(1), (b, t, enc_dim))
    enc_mask = jnp.asarray([[True] * 7, [True] * 4 + [False] * 3])
    dec_state = jax.random.normal(jax.random.PRNGKey(2), (b, dec_dim))
    prev_align = jnp.ones((b, t)) / t
    keys = precompute_keys(params, cfg, enc_out)
    ctx, align = attend(params, cfg, enc_out, keys, enc_mask, dec_state, prev_align)
    assert ctx.shape == (b, enc_dim) and align.shape == (b, t)
    np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, atol=1e-5)
    # masked positions get zero weight
    assert np.all(np.asarray(align[1, 4:]) < 1e-8)
    # context is a convex combination of encoder frames
    assert np.all(np.isfinite(np.asarray(ctx)))


def test_content_attention_matches_numpy_oracle():
    cfg = AttentionConfig(attention_type="content", attention_dim=4, sharpening_factor=2.0)
    params = init_attention(jax.random.PRNGKey(3), cfg, 5, 3)
    enc_out = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 5))
    dec = jax.random.normal(jax.random.PRNGKey(5), (1, 3))
    mask = jnp.ones((1, 6), bool)
    keys = precompute_keys(params, cfg, enc_out)
    ctx, align = attend(params, cfg, enc_out, keys, mask, dec, jnp.zeros((1, 6)))
    e = np.asarray(enc_out[0]) @ np.asarray(params["w_enc"])
    q = np.asarray(dec) @ np.asarray(params["w_dec"])
    en = np.tanh(e + q + np.asarray(params["b"])) @ np.asarray(params["v"]) * 2.0
    soft = np.exp(en - en.max()) / np.exp(en - en.max()).sum()
    np.testing.assert_allclose(np.asarray(align[0]), soft, atol=1e-4)


def test_sigmoid_smoothing_normalizes():
    cfg = AttentionConfig(attention_type="content", attention_dim=4, sigmoid_smoothing=True)
    params = init_attention(jax.random.PRNGKey(0), cfg, 5, 3)
    enc_out = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 5))
    mask = jnp.asarray([[True] * 6, [True] * 3 + [False] * 3])
    keys = precompute_keys(params, cfg, enc_out)
    _, align = attend(params, cfg, enc_out, keys, mask, jnp.zeros((2, 3)), jnp.zeros((2, 6)))
    np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(align[1, 3:]) < 1e-8)


def test_make_decoder_io():
    cfg = Seq2SeqConfig(num_classes=5)
    labels = jnp.asarray([[0, 1, 2], [3, -1, -1]])
    label_len = jnp.asarray([3, 1])
    li, tgt, mask = make_decoder_io(cfg, labels, label_len)
    np.testing.assert_array_equal(np.asarray(li[0]), [5, 0, 1, 2])  # sos=5
    np.testing.assert_array_equal(np.asarray(tgt[0]), [0, 1, 2, 6])  # eos=6
    np.testing.assert_array_equal(np.asarray(tgt[1]), [3, 6, -1, -1])
    np.testing.assert_array_equal(np.asarray(mask), [[1, 1, 1, 1], [1, 1, 0, 0]])


def _tiny_cfg(num_classes=5, **kw):
    return Seq2SeqConfig(
        encoder=EncoderConfig(encoder_type="pyramidal_blstm", num_units=12, num_layers=2),
        attention=AttentionConfig(attention_type="hybrid", attention_dim=8, conv_width=5, conv_num_channels=2),
        num_classes=num_classes,
        decoder_num_units=10,
        embedding_dim=6,
        max_decode_length=8,
        **kw,
    )


def test_seq2seq_forward_and_greedy_shapes():
    cfg = _tiny_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg, input_dim=9)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 9))
    feat_len = jnp.asarray([12, 7])
    labels_in = jnp.asarray([[5, 0, 1, 2], [5, 3, 6, 6]])
    out = forward_train(params, cfg, feats, feat_len, labels_in, jax.random.PRNGKey(2))
    assert out.logits.shape == (2, 4, 7)
    assert out.attention_weights.shape == (2, 4, 6)  # pyramid halves once
    g = greedy_decode(params, cfg, feats, feat_len)
    assert g.predicted_ids.shape == (2, 8)
    assert g.logits.shape == (2, 8, 7)


def test_joint_head_present():
    cfg = _tiny_cfg(ctc_loss_weight=0.3)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg, input_dim=9)
    assert "ctc_head" in params
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 9))
    out = forward_train(params, cfg, feats, jnp.asarray([12]), jnp.asarray([[5, 0]]), jax.random.PRNGKey(2))
    assert out.ctc_logits.shape == (1, 6, 6)  # [B, T/2, num_classes+1]
