"""Tensor (model) parallelism on the virtual 8-device mesh.

Correctness bar: a dp x tp 2-D mesh must reproduce the single-device train
step bit-for-bit (up to float tolerance) while actually sharding the
conformer/transformer block weights over the model axis — GSPMD inserts the
Megatron column->row collectives, we only place the data.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.parallel import (
    make_mesh_2d,
    param_partition_specs,
    setup_tensor_parallel,
)
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def _setup(encoder_type="transformer", optimizer="adam"):
    task = CTCTaskConfig(
        model=CTCConfig(
            # depthwise_impl="shifts": 2-D meshes need the partition-safe
            # depthwise conv (the grouped conv's kernel grad silently zeroes
            # under dp x tp — ConformerSpec.depthwise_impl). fit() routes
            # this automatically from num_model_shards.
            encoder=EncoderConfig(encoder_type=encoder_type, num_units=16,
                                  num_layers=2, num_heads=2, conv_kernel_size=5,
                                  depthwise_impl="shifts"),
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
    # numeric-equality cases use sgd: adam's per-element grad normalization
    # amplifies cross-shard reduction-order noise on near-zero grads (the DP
    # tests make the same choice)
    opt = build_optimizer(optimizer, clip_grad_norm=5.0 if optimizer == "adam" else None)
    return task, opt, params, batch


def test_mesh_2d_axes():
    mesh = make_mesh_2d(4, 2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    import pytest

    with pytest.raises(ValueError, match="have"):
        make_mesh_2d(8, 2)


def test_partition_specs_rules():
    task, _, params, _ = _setup("conformer")
    specs = param_partition_specs(params)
    layer = specs["encoder"]["conformer"]["layers"][0]
    # column-parallel q/k/v and ff-in
    assert layer["mhsa"]["q"]["w"] == P(None, "model")
    assert layer["mhsa"]["q"]["b"] == P("model")
    assert layer["ff1"]["in"]["w"] == P(None, "model")
    # row-parallel o and ff-out, replicated bias
    assert layer["mhsa"]["o"]["w"] == P("model", None)
    assert layer["mhsa"]["o"]["b"] == P()
    assert layer["ff2"]["out"]["w"] == P("model", None)
    # conv module and norms replicated
    assert layer["conv"]["pw1"]["w"] == P()
    assert layer["ln"]["g"] == P()
    # CTC head replicated
    assert specs["head"]["w"] == P()


def test_partition_specs_leave_rnn_replicated():
    task, _, params, _ = _setup()
    blstm = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=8, num_layers=1),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    p = init_params(jax.random.PRNGKey(0), blstm)
    specs = param_partition_specs(p)
    assert all(s == P() for s in jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))


def _run_tp_case(encoder_type):
    task, opt, params, batch = _setup(encoder_type, optimizer="sgd")
    step = make_train_step(task, opt)

    # single device
    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    # 4 x 2 dp x tp mesh
    mesh = make_mesh_2d(4, 2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_tensor_parallel(mesh, p8, s8, batch)
    # the qkv weight really is sharded over the model axis
    qw = p8["encoder"]["conformer"]["layers"][0]["mhsa"]["q"]["w"]
    assert qw.sharding.spec == P(None, "model")
    assert {s.data.shape for s in qw.addressable_shards} == {(16, 8)}
    p8, s8, aux8 = step(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=2e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5)
    # updated params keep their tensor-parallel placement (donated through)
    qw2 = p8["encoder"]["conformer"]["layers"][0]["mhsa"]["q"]["w"]
    assert qw2.sharding.spec == P(None, "model")
    assert len(qw2.sharding.device_set) == 8


def test_tp_transformer_matches_single_device():
    _run_tp_case("transformer")


def test_tp_conformer_matches_single_device():
    _run_tp_case("conformer")


def test_opt_state_follows_params():
    task, opt, params, batch = _setup()
    mesh = make_mesh_2d(4, 2)
    s = opt.init(params)
    p8, s8, _ = setup_tensor_parallel(mesh, params, s, batch)
    # adam mu for the qkv weight takes the param's spec; count replicates
    mu_leaves = [
        (path, leaf) for path, leaf in
        jax.tree_util.tree_flatten_with_path(s8)[0]
    ]
    qkv_mu = [l for path, l in mu_leaves
              if "mhsa" in str(path) and "'q'" in str(path)
              and "'w'" in str(path) and "mu" in str(path)]
    assert qkv_mu, "adam mu leaf for mhsa/q/w not found"
    assert all(l.sharding.spec == P(None, "model") for l in qkv_mu)
    counts = [l for path, l in mu_leaves if "count" in str(path)]
    assert counts and all(l.sharding.spec == P() for l in counts)


def test_fit_tensor_parallel_end_to_end(tmp_path):
    """fit() with num_devices=8 num_model_shards=2 trains a conformer over
    the 4x2 virtual mesh."""
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=2, toy_num_utts=24, toy_max_units=4,
        num_devices=8, num_model_shards=2,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_fit_rejects_indivisible_model_shards(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    import pytest

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=1, toy_num_utts=8,
        num_devices=8, num_model_shards=3,
        use_delta=False, use_energy=False,
    )
    with pytest.raises(ValueError, match="not divisible by num_model_shards"):
        fit(exp, str(tmp_path / "m"), print_fn=lambda *a: None)


def test_tp_forward_inserts_model_collective():
    """The compiled dp x tp step really partitions over the model axis:
    the program contains a cross-model all-reduce (the Megatron row-parallel
    output reduction), not just the dp gradient psum."""
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import forward_loss

    task, opt, params, batch = _setup()
    mesh = make_mesh_2d(4, 2)
    s = opt.init(params)
    p8, s8, b8 = setup_tensor_parallel(mesh, params, s, batch)
    lowered = jax.jit(
        lambda p, b: jax.grad(lambda p_: forward_loss(p_, task, b, train=False)[0])(p)
    ).lower(p8, b8)
    txt = lowered.compile().as_text()
    assert "all-reduce" in txt
