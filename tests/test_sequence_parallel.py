"""Sequence (context) parallelism on the virtual 8-device mesh.

Correctness bar: a dp x sp 2-D mesh must reproduce the single-device train
step bit-for-bit (up to float tolerance) while actually sharding the
conformer/transformer ACTIVATION time axis over the ``seq`` axis — weights
replicate, GSPMD derives the attention k/v all-gather and the depthwise-conv
halo exchanges from one with_sharding_constraint per block (parallel/sp.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.parallel import (
    make_mesh_dp_sp,
    setup_sequence_parallel,
)
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    forward_loss,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def _setup(encoder_type="transformer", sp=None, dp=1):
    """sp=None -> plain single-device config; sp>1 -> sequence-parallel.

    depthwise_impl='shifts' in BOTH so the math is identical (2-D meshes
    need the partition-safe depthwise conv; fit() routes this from
    num_sequence_shards automatically).
    """
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(
                encoder_type=encoder_type, num_units=16, num_layers=2,
                num_heads=2, conv_kernel_size=5, depthwise_impl="shifts",
                sequence_shards=sp, sequence_data_parallel=dp,
            ),
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
    # sgd: numeric-equality cases avoid adam's amplification of cross-shard
    # reduction-order noise (same choice as the DP/TP tests)
    opt = build_optimizer("sgd")
    return task, opt, params, batch


def test_mesh_dp_sp_axes():
    mesh = make_mesh_dp_sp(4, 2)
    assert mesh.axis_names == ("data", "seq")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError, match="have"):
        make_mesh_dp_sp(8, 2)


def _run_sp_case(encoder_type):
    # single device (no constraints, same shifts math)
    task1, opt, params, batch = _setup(encoder_type)
    step1 = make_train_step(task1, opt)
    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step1(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    # 4 x 2 dp x sp mesh: same params, constrained encoder
    task8, _, _, _ = _setup(encoder_type, sp=2, dp=4)
    step8 = make_train_step(task8, opt)
    mesh = make_mesh_dp_sp(4, 2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_sequence_parallel(mesh, p8, s8, batch)
    # weights really replicate over the full mesh (sp shards activations)
    w = jax.tree.leaves(p8)[0]
    assert w.sharding.spec == P()
    assert len(w.sharding.device_set) == 8
    p8, s8, aux8 = step8(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=2e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5)


def test_sp_transformer_matches_single_device():
    _run_sp_case("transformer")


def test_sp_conformer_matches_single_device():
    _run_sp_case("conformer")


def test_sp_program_shards_time_axis():
    """The compiled dp x sp grad program really partitions over the seq
    axis: a cross-seq collective (the attention k/v all-gather or the
    backward reduce) appears in the compiled text."""
    task, opt, params, batch = _setup("transformer", sp=2, dp=4)
    mesh = make_mesh_dp_sp(4, 2)
    s = opt.init(params)
    p8, s8, b8 = setup_sequence_parallel(mesh, params, s, batch)
    lowered = jax.jit(
        lambda p, b: jax.grad(lambda p_: forward_loss(p_, task, b, train=False)[0])(p)
    ).lower(p8, b8)
    txt = lowered.compile().as_text()
    assert "all-gather" in txt or "all-reduce" in txt


def test_fit_sequence_parallel_end_to_end(tmp_path):
    """fit() with num_devices=8 num_sequence_shards=2 trains a conformer
    over the 4x2 (data, seq) virtual mesh."""
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=2, toy_num_utts=24, toy_max_units=4,
        num_devices=8, num_sequence_shards=2,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_fit_rejects_sp_with_expert_shards(tmp_path):
    """tp+sp COMPOSE since round 4 (tests/test_3d_parallel.py); the expert
    and pipeline axes remain exclusive with every other model axis."""
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=1, toy_num_utts=8, moe_num_experts=4,
        num_devices=8, num_expert_shards=2, num_sequence_shards=2,
        use_delta=False, use_energy=False,
    )
    with pytest.raises(ValueError, match="exclusive"):
        fit(exp, str(tmp_path / "m"), print_fn=lambda *a: None)


def test_config_routes_shifts_and_rejects_rnn():
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=2, num_heads=2,
        num_devices=8, num_sequence_shards=2,
    )
    enc = exp.encoder_config()
    assert enc.depthwise_impl == "shifts"
    assert enc.sequence_shards == 2
    assert enc.sequence_data_parallel == 4

    bad = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="blstm",
        num_units=16, num_layers=2,
        num_devices=8, num_sequence_shards=2,
    )
    with pytest.raises(ValueError, match="conformer"):
        bad.encoder_config()


def test_eval_restore_skips_constraint_on_few_devices(monkeypatch):
    """A seq-parallel checkpoint restored where fewer devices are visible
    than dp*sp must still run (apply_encoder skips the constraint)."""
    import tensorflow_end2end_speech_recognition_tpu.models.encoders as enc_mod

    task, _, params, batch = _setup("transformer", sp=2, dp=8)  # needs 16 > 8
    loss, _ = forward_loss(params, task, batch, train=False)
    assert np.isfinite(float(loss))
