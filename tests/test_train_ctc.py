"""End-to-end CTC convergence smoke test (the reference's test style:
build the real graph on toy data, watch loss drop and decode approach the
transcript — SURVEY.md §3.5/§4 — but with assertions instead of prints)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.data import Dataset, ToyCorpus
from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    forward_loss,
    init_params,
    make_eval_step,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer
from tensorflow_end2end_speech_recognition_tpu.utils.edit_distance import compute_per


def test_ctc_learns_toy_task():
    corpus = ToyCorpus(num_utts=12, vocab_size=6, min_units=2, max_units=4, seed=7)
    tok = corpus.tokenizer
    ds = Dataset(corpus.utterances, batch_size=12, num_wav_buckets=1, num_label_buckets=1)

    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=32, num_layers=1),
            num_classes=tok.num_units,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
        num_stack=3,
        num_skip=3,
    )
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    train_step = make_train_step(task, opt)
    eval_step = make_eval_step(task)

    batch = next(ds.batches(0))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}
    first_loss = None
    rng = jax.random.PRNGKey(1)
    for step in range(150):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = train_step(params, opt_state, jbatch, 3e-3, sub)
        if first_loss is None:
            first_loss = float(aux["loss"])
    last_loss = float(aux["loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    decoded, dec_len, nll = eval_step(params, jbatch)
    pers = []
    for i in range(len(batch["names"])):
        if batch["names"][i] is None:
            continue
        ref = [tok.units[j] for j in batch["labels"][i] if j >= 0]
        hyp = tok.decode(np.asarray(decoded[i][: int(dec_len[i])]))
        pers.append(compute_per(ref, hyp))
    assert np.mean(pers) < 0.5, pers


def test_bad_step_rolls_back_params_and_opt_state():
    """A rejected update (impossible CTC alignment -> clamped huge loss) must
    leave BOTH params and optimizer moments untouched: a NaN/inf gradient
    that reaches Adam's mu/nu poisons every later step."""
    corpus = ToyCorpus(num_utts=4, vocab_size=5, min_units=2, max_units=3, seed=3)
    ds = Dataset(corpus.utterances, batch_size=4, num_wav_buckets=1, num_label_buckets=1)
    batch = {k: jnp.asarray(v) for k, v in next(ds.batches(0)).items() if k != "names"}
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=16, num_layers=1),
            num_classes=corpus.tokenizer.num_units,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
        num_stack=3,
        num_skip=3,
    )
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    train_step = make_train_step(task, opt)
    # labels far longer than the downsampled logit length: no valid alignment
    bad = dict(batch)
    u = 4096
    bad["labels"] = jnp.zeros((4, u), jnp.int32)
    bad["label_len"] = jnp.full((4,), u, jnp.int32)
    p0 = jax.tree.map(np.asarray, params)
    s0 = jax.tree.map(np.asarray, opt_state)
    params, opt_state, aux = train_step(params, opt_state, bad, 1e-3, jax.random.PRNGKey(1))
    assert bool(aux["nonfinite"])
    jax.tree.map(np.testing.assert_array_equal, jax.tree.map(np.asarray, params), p0)
    jax.tree.map(np.testing.assert_array_equal, jax.tree.map(np.asarray, opt_state), s0)
    # and a good batch afterwards still produces a finite, moving update
    params, opt_state, aux = train_step(params, opt_state, batch, 1e-3, jax.random.PRNGKey(2))
    assert not bool(aux["nonfinite"])
    assert np.isfinite(float(aux["loss"]))


def test_forward_loss_is_finite_with_dropout_and_decay():
    corpus = ToyCorpus(num_utts=4, vocab_size=5, seed=1)
    ds = Dataset(corpus.utterances, batch_size=4, num_wav_buckets=1, num_label_buckets=1)
    batch = {k: jnp.asarray(v) for k, v in next(ds.batches(0)).items() if k != "names"}
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=16, num_layers=1,
                                  dropout_keep_prob=0.8),
            num_classes=corpus.tokenizer.num_units,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
        weight_decay=1e-6,
    )
    params = init_params(jax.random.PRNGKey(0), task)
    loss, aux = forward_loss(params, task, batch, train=True, rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert float(aux["loss"]) >= float(aux["ctc_nll"])  # decay adds mass
