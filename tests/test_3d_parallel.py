"""3-D parallelism composition: data x seq x model (+ ZeRO-3).

VERDICT r3 #3: tp and sp were pairwise-exclusive; both are placement-only
GSPMD axes, so their composition is spec arithmetic — Megatron weight
specs name ``model``, the activation constraint names ``(data, seq)``.
Correctness bar (same as the 2-D axes): the dp2 x sp2 x tp2 train step on
the 8-virtual-device mesh EQUALS the single-device step, the Megatron
weights really live sharded over ``model`` (and 2-D over ``data`` too
under fsdp), and fit() accepts the combined config keys.
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
    make_mesh_3d,
    param_partition_specs,
    setup_tensor_parallel,
)
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def _setup(encoder_type="transformer", composed=False):
    """composed=True -> the dp2 x sp2 x tp2 encoder config; else single-dev.

    depthwise_impl='shifts' in BOTH so the math is identical (required
    under any mesh that shards T or d; fit() routes it automatically).
    """
    kw = dict(sequence_shards=2, sequence_data_parallel=2,
              sequence_model_parallel=2) if composed else {}
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(
                encoder_type=encoder_type, num_units=16, num_layers=2,
                num_heads=2, conv_kernel_size=5, depthwise_impl="shifts",
                **kw,
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
    opt = build_optimizer("sgd")  # equality cases use sgd (see DP/TP tests)
    return task, opt, params, batch


def test_mesh_3d_axes():
    mesh = make_mesh_3d(2, 2, 2)
    assert mesh.axis_names == ("data", "seq", "model")
    assert mesh.devices.shape == (2, 2, 2)
    with pytest.raises(ValueError, match="have"):
        make_mesh_3d(4, 2, 2)


def _single_device_step(encoder_type, params, batch):
    task1, opt, _, _ = _setup(encoder_type)
    step1 = make_train_step(task1, opt)
    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    return step1(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))


def _assert_equal(aux1, p1, aux8, p8):
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=2e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _run_3d_case(encoder_type):
    task1, opt, params, batch = _setup(encoder_type)
    p1, s1, aux1 = _single_device_step(encoder_type, params, batch)

    task8, _, _, _ = _setup(encoder_type, composed=True)
    step8 = make_train_step(task8, opt)
    mesh = make_mesh_3d(2, 2, 2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_tensor_parallel(mesh, p8, s8, batch)
    # a Megatron column-parallel weight really lives sharded over model
    specs = param_partition_specs(p8)
    flat_p = jax.tree_util.tree_leaves_with_path(p8)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    sharded = [
        (leaf, spec) for (_, leaf), spec in zip(flat_p, flat_s)
        if spec == P(None, "model")
    ]
    assert sharded, "no column-parallel weights found"
    for leaf, spec in sharded:
        assert leaf.sharding.spec == spec
        assert len(leaf.sharding.device_set) == 8
    p8, s8, aux8 = step8(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))
    _assert_equal(aux1, p1, aux8, p8)


def test_3d_transformer_matches_single_device():
    _run_3d_case("transformer")


def test_3d_conformer_matches_single_device():
    _run_3d_case("conformer")


def test_3d_with_fsdp_matches_single_device():
    """ZeRO-3 on top of the 3-D mesh: the data axis fills each Megatron
    weight's free axis (2-D weight sharding over (data, model)) while
    numerics stay identical."""
    from tensorflow_end2end_speech_recognition_tpu.parallel import setup_fsdp

    encoder_type = "transformer"
    task1, opt, params, batch = _setup(encoder_type)
    p1, s1, aux1 = _single_device_step(encoder_type, params, batch)

    task8, _, _, _ = _setup(encoder_type, composed=True)
    step8 = make_train_step(task8, opt)
    mesh = make_mesh_3d(2, 2, 2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, _ = setup_fsdp(mesh, p8, s8, base_specs=param_partition_specs(p8))
    from tensorflow_end2end_speech_recognition_tpu.parallel import shard_batch

    b8 = shard_batch(mesh, batch)
    # at least one weight is 2-D sharded (data fills the free axis of a
    # Megatron-parallel matrix)
    def axes_of(spec):
        names = set()
        for entry in spec:
            if entry is None:
                continue
            for n in (entry if isinstance(entry, tuple) else (entry,)):
                names.add(n)
        return names

    two_d = [
        leaf for leaf in jax.tree.leaves(p8)
        if {"data", "model"} <= axes_of(leaf.sharding.spec)
    ]
    assert two_d, "no 2-D (data x model) sharded weights under fsdp+tp"
    p8, s8, aux8 = step8(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))
    _assert_equal(aux1, p1, aux8, p8)


def test_fit_3d_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=2, toy_num_utts=24, toy_max_units=4,
        num_devices=8, num_model_shards=2, num_sequence_shards=2,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100,
                  print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_config_derives_3d_dims():
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=2, num_heads=2,
        num_devices=8, num_model_shards=2, num_sequence_shards=2,
    )
    enc = exp.encoder_config()
    assert enc.sequence_shards == 2
    assert enc.sequence_model_parallel == 2
    assert enc.sequence_data_parallel == 2  # 8 / (2*2)
    assert enc.depthwise_impl == "shifts"


def _pp_tp_task(composed=False):
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(
                encoder_type="conformer", num_units=16, num_layers=4,
                num_heads=2, conv_kernel_size=5, depthwise_impl="shifts",
                pipeline_stages=2 if composed else None,
                pipeline_microbatches=4,
                pipeline_data_parallel=2 if composed else 1,
                pipeline_model_parallel=2 if composed else 1,
            ),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    return task


def test_pp_tp_full_step_matches_single_device():
    """dp2 x pp2 x tp2: the partial-manual pipeline (pipe/data manual,
    model auto) with 2-D (pipe, model) stage weights reproduces the
    single-device train step."""
    from tensorflow_end2end_speech_recognition_tpu.parallel import (
        pp_stack_tree,
        setup_pipeline_parallel,
        shard_batch,
    )
    from tensorflow_end2end_speech_recognition_tpu.parallel.pp import (
        make_mesh_dp_pp_tp,
    )

    rng = np.random.RandomState(0)
    b = 8
    batch = {
        "inputs": jnp.asarray(rng.randn(b, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((b,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 6, (b, 4)).astype(np.int32)),
        "label_len": jnp.full((b,), 4, jnp.int32),
    }
    opt = build_optimizer("sgd")
    task1 = _pp_tp_task()
    params = init_params(jax.random.PRNGKey(0), task1)
    step1 = make_train_step(task1, opt)
    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step1(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    task8 = _pp_tp_task(composed=True)
    mesh = make_mesh_dp_pp_tp(2, 2, 2)
    p8 = pp_stack_tree(jax.tree.map(jnp.copy, params), 2)
    s8 = pp_stack_tree(opt.init(jax.tree.map(jnp.copy, params)), 2)
    p8, s8, _ = setup_pipeline_parallel(mesh, p8, s8, model=True)
    qw = p8["encoder"]["conformer"]["layers"]["mhsa"]["q"]["w"]
    assert qw.sharding.spec == P("pipe", None, None, "model"), qw.sharding
    assert len(qw.sharding.device_set) == 8
    b8 = shard_batch(mesh, batch)
    step8 = make_train_step(task8, opt)
    p8, s8, aux8 = step8(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))
    from tensorflow_end2end_speech_recognition_tpu.parallel import pp_unstack_tree

    p8 = pp_unstack_tree(p8)
    _assert_equal(aux1, p1, aux8, p8)
    # updated stage weights kept their 2-D sharding (no resharding per step)


def test_fit_pp_tp_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=2, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=2, toy_num_utts=24, toy_max_units=4,
        num_devices=8, num_model_shards=2, num_pipeline_stages=2,
        num_pipeline_microbatches=4,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100,
                  print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_pp_and_sp_still_exclusive(tmp_path):
    """pp composes with tp (above); pp + sp would shard the same
    activations two ways and stays rejected."""
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=2, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=1, toy_num_utts=8,
        num_devices=8, num_sequence_shards=2, num_pipeline_stages=2,
        use_delta=False, use_energy=False,
    )
    with pytest.raises(ValueError, match="exclusive"):
        fit(exp, str(tmp_path / "m"), print_fn=lambda *a: None)
