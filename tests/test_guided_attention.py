"""Guided-attention loss + CTC-weight anneal (the attention-convergence
recipe, VERDICT r3 #2).

The reference trained its attention models for tens of epochs before the
alignment emerged (SURVEY.md §2.3 scheduled sampling / train_attention.py);
at short budgets the decoder plateaus. The recipe: penalize attention mass
off the monotonic diagonal (Tachibana et al. 2017) with an annealed weight,
and for joint models start CTC-heavy and anneal λ down.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.train.att_task import (
    AttTaskConfig,
    ctc_lambda,
    forward_loss,
    ga_weight_schedule,
    guided_attention_penalty,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import Seq2SeqConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig


def _numpy_penalty(att_w, label_mask, enc_len, sigma):
    b, u_dim, t_dim = att_w.shape
    out = np.zeros(b)
    for i in range(b):
        ulen = max(label_mask[i].sum(), 1.0)
        tlen = max(float(enc_len[i]), 1.0)
        acc = 0.0
        for u in range(u_dim):
            if not label_mask[i, u]:
                continue
            for t in range(int(enc_len[i])):
                w = 1.0 - np.exp(-0.5 * ((t / tlen - u / ulen) ** 2) / sigma**2)
                acc += att_w[i, u, t] * w
        out[i] = acc / ulen
    return out


def test_penalty_equals_numpy_oracle():
    rng = np.random.RandomState(0)
    b, u, t = 3, 5, 9
    att = rng.dirichlet(np.ones(t), size=(b, u)).astype(np.float32)
    mask = (np.arange(u)[None, :] < np.array([5, 3, 1])[:, None]).astype(np.float32)
    enc_len = np.array([9, 6, 4])
    got = np.asarray(
        guided_attention_penalty(jnp.asarray(att), jnp.asarray(mask),
                                 jnp.asarray(enc_len), 0.2)
    )
    want = _numpy_penalty(att, mask, enc_len, 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_diagonal_alignment_scores_near_zero_uniform_scores_high():
    u = t = 16
    # perfect monotonic diagonal: attention row u peaks at t = u * T/U
    diag = np.zeros((1, u, t), np.float32)
    for i in range(u):
        diag[0, i, int(i * t / u)] = 1.0
    uniform = np.full((1, u, t), 1.0 / t, np.float32)
    mask = np.ones((1, u), np.float32)
    enc_len = np.array([t])
    p_diag = float(guided_attention_penalty(jnp.asarray(diag), jnp.asarray(mask),
                                            jnp.asarray(enc_len), 0.2)[0])
    p_unif = float(guided_attention_penalty(jnp.asarray(uniform), jnp.asarray(mask),
                                            jnp.asarray(enc_len), 0.2)[0])
    assert p_diag < 0.05, p_diag
    assert p_unif > 0.4, p_unif
    assert p_unif > 5 * p_diag


def _task(**kw):
    enc = EncoderConfig(encoder_type="blstm", num_units=16, num_layers=1)
    model = Seq2SeqConfig(
        encoder=enc, num_classes=6, decoder_num_units=16, embedding_dim=8,
        attention=kw.pop("attention", None) or _attention(),
        max_decode_length=8, ctc_loss_weight=kw.pop("ctc_loss_weight", 0.0),
    )
    return AttTaskConfig(model=model, frontend=None, feature_dim=5, **kw)


def _attention():
    from tensorflow_end2end_speech_recognition_tpu.models.attention import AttentionConfig

    return AttentionConfig(attention_type="content", attention_dim=8)


def _batch(rng, b=4, t=12, u=5, vocab=6, dim=5):
    return {
        "inputs": rng.randn(b, t, dim).astype(np.float32),
        "input_len": np.full((b,), t, np.int32),
        "labels": np.where(
            np.arange(u)[None, :] < np.array([5, 4, 3, 2])[:, None],
            rng.randint(0, vocab, (b, u)), -1
        ).astype(np.int32),
        "label_len": np.array([5, 4, 3, 2], np.int32),
    }


def test_schedules():
    t = _task(guided_attention_weight=2.0, guided_attention_decay_steps=100)
    assert float(ga_weight_schedule(t, 0)) == 2.0
    np.testing.assert_allclose(float(ga_weight_schedule(t, 50)), 1.0)
    assert float(ga_weight_schedule(t, 100)) == 0.0
    assert float(ga_weight_schedule(t, 500)) == 0.0  # clamped, never negative
    t2 = _task(guided_attention_weight=2.0)  # no decay: constant
    assert float(ga_weight_schedule(t2, 10**6)) == 2.0

    tj = _task(ctc_loss_weight=0.3, ctc_weight_init=0.9, ctc_weight_anneal_steps=10)
    np.testing.assert_allclose(float(ctc_lambda(tj, 0)), 0.9)
    np.testing.assert_allclose(float(ctc_lambda(tj, 5)), 0.6)
    np.testing.assert_allclose(float(ctc_lambda(tj, 10)), 0.3, atol=1e-7)
    np.testing.assert_allclose(float(ctc_lambda(tj, 99)), 0.3, atol=1e-7)
    tj2 = _task(ctc_loss_weight=0.3)  # static λ by default
    assert ctc_lambda(tj2, 7) == 0.3


def test_guided_loss_added_in_train_not_eval():
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    plain, guided = _task(), _task(guided_attention_weight=1.0)
    params = init_params(jax.random.PRNGKey(0), plain)
    key = jax.random.PRNGKey(2)
    l0, aux0 = forward_loss(params, plain, batch, train=True, rng=key)
    l1, aux1 = forward_loss(params, guided, batch, train=True, rng=key)
    assert "guided_att" in aux1 and "guided_att" not in aux0
    np.testing.assert_allclose(float(l1), float(l0) + float(aux1["guided_att"]),
                               rtol=1e-6)
    # eval-mode NLL must not include the penalty
    e0, _ = forward_loss(params, plain, batch, train=False, rng=None)
    e1, _ = forward_loss(params, guided, batch, train=False, rng=None)
    np.testing.assert_allclose(float(e0), float(e1))


def test_guided_loss_added_for_joint_models():
    """Regression: the joint branch REPLACES the base loss with the λ mix;
    the guided penalty must be added after it (it was silently dropped for
    joint models — every joint guided arm equaled its baseline exactly)."""
    rng = np.random.RandomState(3)
    batch = _batch(rng)
    plain = _task(ctc_loss_weight=0.3)
    guided = _task(ctc_loss_weight=0.3, guided_attention_weight=2.0)
    params = init_params(jax.random.PRNGKey(0), plain)
    key = jax.random.PRNGKey(2)
    l0, aux0 = forward_loss(params, plain, batch, train=True, rng=key)
    l1, aux1 = forward_loss(params, guided, batch, train=True, rng=key)
    assert "ctc_nll" in aux1  # really the joint family
    np.testing.assert_allclose(
        float(l1), float(l0) + 2.0 * float(aux1["guided_att"]), rtol=1e-6
    )
    # eval-mode NLL unchanged
    e0, _ = forward_loss(params, plain, batch, train=False, rng=None)
    e1, _ = forward_loss(params, guided, batch, train=False, rng=None)
    np.testing.assert_allclose(float(e0), float(e1))


def test_joint_lambda_anneal_in_train_step():
    """λ anneal: early steps weigh the CTC term per ctc_weight_init."""
    rng = np.random.RandomState(3)
    batch = _batch(rng)
    task = _task(ctc_loss_weight=0.2, ctc_weight_init=0.8,
                 ctc_weight_anneal_steps=4)
    params = init_params(jax.random.PRNGKey(0), task)
    key = jax.random.PRNGKey(1)
    l_early, aux = forward_loss(params, task, batch, train=True, rng=key, step=0)
    l_late, aux2 = forward_loss(params, task, batch, train=True, rng=key,
                                step=jnp.asarray(1000))
    want_early = 0.8 * float(aux["ctc_nll"]) + 0.2 * float(aux["att_nll"])
    want_late = 0.2 * float(aux2["ctc_nll"]) + 0.8 * float(aux2["att_nll"])
    np.testing.assert_allclose(float(l_early), want_early, rtol=1e-6)
    np.testing.assert_allclose(float(l_late), want_late, rtol=1e-6)


def test_train_step_runs_and_penalty_falls():
    """A few guided steps must push attention toward the diagonal."""
    from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer

    rng = np.random.RandomState(4)
    batch = _batch(rng, b=4, t=12, u=5)
    task = _task(guided_attention_weight=5.0)
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam")  # unscaled directions; apply_updates subtracts
    step_fn = make_train_step(task, opt)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(5)
    _, aux0 = forward_loss(params, task, batch, train=True, rng=key)
    for i in range(8):
        params, opt_state, aux = step_fn(
            params, opt_state, {k: jnp.asarray(v) for k, v in batch.items()},
            3e-3, key, jnp.asarray(i))
    _, aux1 = forward_loss(params, task, batch, train=True, rng=key)
    assert float(aux1["guided_att"]) < float(aux0["guided_att"]), (
        float(aux0["guided_att"]), float(aux1["guided_att"]))
