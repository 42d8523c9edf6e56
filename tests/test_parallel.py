"""Data-parallel training on the virtual 8-device mesh: correctness vs single device."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.parallel import (
    make_mesh,
    setup_data_parallel,
)
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def _setup():
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=8, num_layers=1),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    rng = np.random.RandomState(0)
    b = 8
    batch = {
        "inputs": jnp.asarray(rng.randn(b, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((b,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 6, (b, 4)).astype(np.int32)),
        "label_len": jnp.full((b,), 4, jnp.int32),
    }
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd", clip_grad_norm=None)
    return task, opt, params, batch


def test_dp_matches_single_device():
    assert len(jax.devices()) >= 8  # conftest forces the 8-device CPU mesh
    task, opt, params, batch = _setup()
    step = make_train_step(task, opt)

    # single device
    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step(p1, s1, batch, 1e-2, jax.random.PRNGKey(1))

    # 8-way data parallel over the mesh
    mesh = make_mesh(8)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_data_parallel(mesh, p8, s8, batch)
    p8, s8, aux8 = step(p8, s8, b8, 1e-2, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # params remain replicated on all 8 devices
    assert len(jax.tree.leaves(p8)[0].sharding.device_set) == 8


def test_dp_batch_actually_sharded():
    task, opt, params, batch = _setup()
    mesh = make_mesh(8)
    _, _, b8 = setup_data_parallel(mesh, params, opt.init(params), batch)
    shard_shapes = {s.data.shape for s in b8["inputs"].addressable_shards}
    assert shard_shapes == {(1, 4096)}  # 8 rows over 8 devices


def test_dp_joint_attention_matches_single_device():
    """DP correctness for the joint CTC-attention train step too (the
    flagship ls960_joint config's step shape)."""
    from tensorflow_end2end_speech_recognition_tpu.models.attention import AttentionConfig
    from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import Seq2SeqConfig
    from tensorflow_end2end_speech_recognition_tpu.train import att_task

    task = att_task.AttTaskConfig(
        model=Seq2SeqConfig(
            encoder=EncoderConfig(encoder_type="pyramidal_blstm", num_units=8,
                                  num_layers=2, num_pyramid_levels=1),
            attention=AttentionConfig(attention_type="hybrid", attention_dim=8,
                                      conv_num_channels=2, conv_width=5),
            num_classes=6, decoder_num_units=8, embedding_dim=4,
            max_decode_length=6, ctc_loss_weight=0.3,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    rng = np.random.RandomState(1)
    b = 8
    batch = {
        "inputs": jnp.asarray(rng.randn(b, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((b,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 6, (b, 4)).astype(np.int32)),
        "label_len": jnp.full((b,), 4, jnp.int32),
    }
    params = att_task.init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd", clip_grad_norm=None)
    step = att_task.make_train_step(task, opt)

    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step(p1, s1, batch, 1e-2, jax.random.PRNGKey(1), 0)

    mesh = make_mesh(8)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_data_parallel(mesh, p8, s8, batch)
    p8, s8, aux8 = step(p8, s8, b8, 1e-2, jax.random.PRNGKey(1), 0)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=1e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)
    assert len(jax.tree.leaves(p8)[0].sharding.device_set) == 8


def test_dp_conformer_matches_single_device():
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="conformer", num_units=16,
                                  num_layers=1, num_heads=2, conv_kernel_size=5),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    rng = np.random.RandomState(2)
    b = 8
    batch = {
        "inputs": jnp.asarray(rng.randn(b, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((b,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 6, (b, 4)).astype(np.int32)),
        "label_len": jnp.full((b,), 4, jnp.int32),
    }
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd", clip_grad_norm=None)
    step = make_train_step(task, opt)
    p1, s1 = jax.tree.map(jnp.copy, params), opt.init(params)
    p1, s1, aux1 = step(p1, s1, batch, 1e-2, jax.random.PRNGKey(1))
    mesh = make_mesh(8)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_data_parallel(mesh, p8, s8, batch)
    p8, s8, aux8 = step(p8, s8, b8, 1e-2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=1e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)


def test_process_slice_partitions_batch():
    from tensorflow_end2end_speech_recognition_tpu.parallel import process_slice

    batch = {
        "inputs": np.arange(32).reshape(8, 4),
        "labels": np.arange(8),
    }
    # P=1: identity
    assert process_slice(batch, 0, 1) is batch
    # P=4: each process gets its contiguous 2-row slice; union = whole batch
    rows = []
    for p in range(4):
        local = process_slice(batch, p, 4)
        assert local["inputs"].shape == (2, 4)
        rows.append(local["inputs"])
    np.testing.assert_array_equal(np.concatenate(rows), batch["inputs"])
    # indivisible batch rejected
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        process_slice({"x": np.zeros((6, 2))}, 0, 4)


def test_global_device_batch_single_process():
    from tensorflow_end2end_speech_recognition_tpu.parallel import (
        global_device_batch,
        process_slice,
    )

    mesh = make_mesh(8)
    host = {"inputs": np.arange(64, dtype=np.float32).reshape(8, 8)}
    out = global_device_batch(mesh, process_slice(host), process_count=1)
    assert out["inputs"].shape == (8, 8)
    assert len(out["inputs"].sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in out["inputs"].addressable_shards}
    assert shard_shapes == {(1, 8)}
    np.testing.assert_array_equal(np.asarray(out["inputs"]), host["inputs"])


def test_fit_data_parallel_end_to_end(tmp_path):
    """fit() with num_devices=8 trains over the virtual CPU mesh."""
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="blstm",
        num_units=8, num_layers=1, batch_size=8, num_epoch=2,
        toy_num_utts=24, toy_max_units=4, num_devices=8,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_pod_eval_sharding_matches_single_process():
    """Per-process row slices + count summation give rates identical to one
    process scoring the full set (SURVEY.md §2.10 pod-scale eval plan)."""
    from tensorflow_end2end_speech_recognition_tpu.data import Dataset
    from tensorflow_end2end_speech_recognition_tpu.parallel.multihost import (
        allreduce_counts,
        process_slice,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import make_eval_step
    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
        build_task,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig
    from tensorflow_end2end_speech_recognition_tpu.utils.metrics import (
        eval_counts,
        evaluate_ctc,
        rates_from_counts,
    )

    exp = ExperimentConfig(
        label_type="phone61", toy_num_utts=24, use_delta=False,
        use_energy=False, num_units=8, num_layers=1, batch_size=8,
    )
    _, dev, _, tok = build_corpus_splits(exp, need=("dev",))
    task, task_mod = build_task(exp, tok)
    params = task_mod.init_params(jax.random.PRNGKey(0), task)
    eval_step = make_eval_step(task)
    ds = Dataset(dev, exp.batch_size)

    full = eval_counts(eval_step, params, ds, tok, exp.label_type)
    # simulate a 4-process pod: each process scores its own row slice
    per_proc = [
        eval_counts(
            eval_step, params, ds, tok, exp.label_type,
            row_slice=lambda b, p=p: process_slice(b, p, 4),
        )
        for p in range(4)
    ]
    summed = np.sum(per_proc, axis=0)
    np.testing.assert_allclose(summed, full)
    # the reduced rates equal the single-process evaluate_ctc output
    m_full = evaluate_ctc(eval_step, params, ds, tok, exp.label_type)
    m_pod = rates_from_counts(summed)
    for k in ("error_rate", "sub_rate", "ins_rate", "del_rate", "num_utts"):
        assert m_pod[k] == m_full[k], k
    np.testing.assert_allclose(m_pod["loss"], m_full["loss"], rtol=1e-6)
    # single-process allreduce is the identity
    np.testing.assert_array_equal(allreduce_counts(full), full)


def test_dp_transducer_matches_single_device():
    from tensorflow_end2end_speech_recognition_tpu.models.transducer import (
        TransducerConfig,
    )
    from tensorflow_end2end_speech_recognition_tpu.train import transducer_task

    task = transducer_task.TransducerTaskConfig(
        model=TransducerConfig(
            encoder=EncoderConfig(encoder_type="lstm", num_units=8, num_layers=1),
            num_classes=6, pred_num_units=8, embedding_dim=4, joint_dim=8,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    rng = np.random.RandomState(3)
    b = 8
    batch = {
        "inputs": jnp.asarray(rng.randn(b, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((b,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 6, (b, 4)).astype(np.int32)),
        "label_len": jnp.full((b,), 4, jnp.int32),
    }
    params = transducer_task.init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd", clip_grad_norm=None)
    step = transducer_task.make_train_step(task, opt)

    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step(p1, s1, batch, 1e-2, jax.random.PRNGKey(1))

    mesh = make_mesh(8)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_data_parallel(mesh, p8, s8, batch)
    p8, s8, aux8 = step(p8, s8, b8, 1e-2, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=1e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)
    assert len(jax.tree.leaves(p8)[0].sharding.device_set) == 8
