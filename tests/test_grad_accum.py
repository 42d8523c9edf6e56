"""Gradient accumulation (train/accum.py).

Correctness bar: ``grad_accum=A`` must reproduce the full-batch train step
(losses are means over equal microbatches, so the averaged microbatch
gradient IS the full-batch gradient) for all three model families, compose
with the data-parallel mesh (strided microbatch rows draw evenly from
every chip's block shard), and run end to end through fit().
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.attention import AttentionConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import Seq2SeqConfig
from tensorflow_end2end_speech_recognition_tpu.models.transducer import TransducerConfig
from tensorflow_end2end_speech_recognition_tpu.train import att_task, transducer_task
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def _batch(b=8, num_classes=6, u=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "inputs": jnp.asarray(rng.randn(b, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((b,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, num_classes, (b, u)).astype(np.int32)),
        "label_len": jnp.full((b,), u, jnp.int32),
    }


def _assert_steps_equal(step1, stepA, params, opt, batch, extra=()):
    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step1(p1, s1, batch, 1e-3, jax.random.PRNGKey(1), *extra)

    pA = jax.tree.map(jnp.copy, params)
    sA = opt.init(pA)
    pA, sA, auxA = stepA(pA, sA, batch, 1e-3, jax.random.PRNGKey(1), *extra)

    np.testing.assert_allclose(float(aux1["loss"]), float(auxA["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pA)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_ctc_accum_matches_full_batch():
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=16, num_layers=2),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd")  # equality cases use sgd (see DP tests)
    _assert_steps_equal(make_train_step(task, opt),
                        make_train_step(task, opt, grad_accum=4),
                        params, opt, _batch())


def test_ctc_accum_matches_full_batch_weighted_rows():
    """Fill-padded short batches (weight=0 rows) must still reproduce the
    full-batch WEIGHTED mean: with strided microbatches the fill rows land
    unevenly (here microbatch 0 holds two real rows, the rest one each),
    so uniform microbatch averaging would bias the gradient — the
    accumulator must carry weighted sums."""
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=16, num_layers=2),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    batch = dict(_batch())
    batch["weight"] = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd")
    _assert_steps_equal(make_train_step(task, opt),
                        make_train_step(task, opt, grad_accum=4),
                        params, opt, batch)


def test_attention_accum_matches_full_batch():
    task = att_task.AttTaskConfig(
        model=Seq2SeqConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=16, num_layers=1),
            attention=AttentionConfig(attention_type="content", attention_dim=8),
            num_classes=6, decoder_num_units=16, embedding_dim=8,
            max_decode_length=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    params = att_task.init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd")
    _assert_steps_equal(att_task.make_train_step(task, opt),
                        att_task.make_train_step(task, opt, grad_accum=2),
                        params, opt, _batch(), extra=(0,))


def test_transducer_accum_matches_full_batch():
    task = transducer_task.TransducerTaskConfig(
        model=TransducerConfig(
            encoder=EncoderConfig(encoder_type="lstm", num_units=16, num_layers=1),
            num_classes=6, pred_num_units=16, embedding_dim=8, joint_dim=16,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    params = transducer_task.init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd")
    _assert_steps_equal(transducer_task.make_train_step(task, opt),
                        transducer_task.make_train_step(task, opt, grad_accum=2),
                        params, opt, _batch())


def test_accum_composes_with_data_parallel():
    """accum=2 over the 8-device data mesh == the single-device full batch
    (the strided microbatch layout keeps each microbatch spread over every
    chip's block shard)."""
    from tensorflow_end2end_speech_recognition_tpu.parallel import (
        make_mesh,
        setup_data_parallel,
    )

    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=16, num_layers=1),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    batch = _batch(b=16)
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd")

    step1 = make_train_step(task, opt)
    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step1(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    mesh = make_mesh(8)
    stepA = make_train_step(task, opt, grad_accum=2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_data_parallel(mesh, p8, s8, batch)
    p8, s8, aux8 = stepA(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_nan_guard_still_rejects_bad_microbatch():
    """An impossible alignment in ONE microbatch (labels longer than frames
    -> clamped ~1e30 loss) must still reject the whole update."""
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=16, num_layers=1),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    batch = dict(_batch(u=30))
    # rows land in different strided microbatches; make every row impossible
    # in microbatch 1 only is not expressible per-row here — instead give
    # row 1 a label longer than its frame count and check the guard fires
    batch["labels"] = jnp.asarray(
        np.random.RandomState(0).randint(1, 6, (8, 30)).astype(np.int32))
    batch["label_len"] = jnp.asarray([4, 30, 4, 4, 4, 4, 4, 4], np.int32)
    batch["input_len"] = batch["input_len"].at[1].set(420)  # ~1 frame
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd")
    step = make_train_step(task, opt, grad_accum=2)
    p = jax.tree.map(jnp.copy, params)
    s = opt.init(p)
    p2, s2, aux = step(p, s, batch, 1e-3, jax.random.PRNGKey(1))
    assert bool(aux["nonfinite"])
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_grad_accum_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="blstm",
        num_units=16, num_layers=1, batch_size=8, num_epoch=2,
        toy_num_utts=24, toy_max_units=4, grad_accum_steps=2,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100,
                  print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_fit_rejects_indivisible_accum(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="blstm",
        num_units=16, num_layers=1, batch_size=8, num_epoch=1,
        toy_num_utts=8, grad_accum_steps=3,
        use_delta=False, use_energy=False,
    )
    with pytest.raises(ValueError, match="grad_accum"):
        fit(exp, str(tmp_path / "m"), print_fn=lambda *a: None)
