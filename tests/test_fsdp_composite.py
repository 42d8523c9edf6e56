"""ZeRO-3 composed with the other placement-only axes (tp/sp/ep).

Correctness bar: ``fsdp: true`` on a 2-D mesh must reproduce the
single-device train step (float tolerance) while the at-rest training
state is 2-D-sharded — Megatron-parallel weights carry BOTH the ``model``
axis and a ``data`` axis (the ZeRO+Megatron production recipe), expert
banks carry ``expert`` + ``data``, and under sp the weights fsdp-shard
over ``data`` exactly as on a 1-D mesh. Pipeline stays exclusive
(``tests/test_fsdp.py`` asserts the rejection).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.parallel import make_mesh_2d
from tensorflow_end2end_speech_recognition_tpu.parallel.ep import (
    expert_partition_specs,
    make_mesh_dp_ep,
)
from tensorflow_end2end_speech_recognition_tpu.parallel.fsdp import (
    fsdp_spec_for,
    setup_fsdp,
)
from tensorflow_end2end_speech_recognition_tpu.parallel.sp import make_mesh_dp_sp
from tensorflow_end2end_speech_recognition_tpu.parallel.tp import param_partition_specs
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def test_compose_spec_fills_largest_free_axis():
    # column-parallel [d, 4d]: data fills the free input axis
    assert fsdp_spec_for(np.zeros((16, 64)), 4, base=P(None, "model")) \
        == P("data", "model")
    # row-parallel [4d, d]: data fills the free output axis
    assert fsdp_spec_for(np.zeros((64, 16)), 4, base=P("model", None)) \
        == P("model", "data")
    # fully-taken or indivisible: base unchanged
    assert fsdp_spec_for(np.zeros((16,)), 4, base=P("model")) == P("model")
    assert fsdp_spec_for(np.zeros((7, 16)), 4, base=P(None, "model")) \
        == P(None, "model")
    # stacked expert bank [E, d, ff]: base names only the leading axis
    assert fsdp_spec_for(np.zeros((4, 16, 64)), 4, base=P("expert")) \
        == P("expert", None, "data")
    # no base: original behavior intact
    assert fsdp_spec_for(np.zeros((40, 64)), 8) == P(None, "data")


def _batch(b=8, num_classes=6):
    rng = np.random.RandomState(0)
    return {
        "inputs": jnp.asarray(rng.randn(b, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((b,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, num_classes, (b, 4)).astype(np.int32)),
        "label_len": jnp.full((b,), 4, jnp.int32),
    }


def _sharded_fraction(tree):
    leaves = jax.tree.leaves(tree)
    total = sum(l.size for l in leaves)
    if not total:
        return 1.0
    return sum(l.size for l in leaves if l.sharding.spec != P()) / total


def test_fsdp_tp_conformer_matches_single_device():
    task = CTCTaskConfig(
        model=CTCConfig(
            # shifts: 2-D meshes need the partition-safe depthwise conv
            # (grouped-conv kernel grads silently zero — parallel/tp.py)
            encoder=EncoderConfig(encoder_type="conformer", num_units=16,
                                  num_layers=2, num_heads=2, conv_kernel_size=5,
                                  depthwise_impl="shifts"),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd")  # equality cases use sgd (see tp tests)
    step = make_train_step(task, opt)

    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    mesh = make_mesh_2d(4, 2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_fsdp(mesh, p8, s8, batch,
                            base_specs=param_partition_specs(p8))

    # Megatron-parallel weights are 2-D sharded: model AND data axes
    layer = p8["encoder"]["conformer"]["layers"][0]
    assert layer["ff1"]["in"]["w"].sharding.spec == P("data", "model")
    assert layer["mhsa"]["o"]["w"].sharding.spec == P("model", "data")
    # replicated-under-tp leaves still fsdp-shard over data
    assert "data" in tuple(p8["head"]["w"].sharding.spec)
    assert _sharded_fraction(p8) > 0.9

    p8, s8, aux8 = step(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=2e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5)
    # donated update keeps the composite placement
    assert _sharded_fraction(p8) > 0.9
    l2 = p8["encoder"]["conformer"]["layers"][0]
    assert l2["ff1"]["in"]["w"].sharding.spec == P("data", "model")


def test_fsdp_ep_matches_single_device():
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="conformer", num_units=16,
                                  num_layers=2, num_heads=2, conv_kernel_size=5,
                                  moe_experts=4),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("sgd")
    step = make_train_step(task, opt)

    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    mesh = make_mesh_dp_ep(4, 2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_fsdp(mesh, p8, s8, batch,
                            base_specs=expert_partition_specs(p8))
    ew = p8["encoder"]["conformer"]["layers"][0]["moe"]["in"]["w"]
    assert ew.sharding.spec[0] == "expert"
    assert "data" in tuple(ew.sharding.spec)  # 2-D: expert x data
    assert _sharded_fraction(p8) > 0.9

    p8, s8, aux8 = step(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=2e-5)
    # same looser atol as test_moe's ep case: the expert-combine einsum
    # contracts over the sharded E axis (reduction-order drift)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=3e-4)


def test_fsdp_sp_matches_single_device():
    def _task(sp=None, dp=1):
        return CTCTaskConfig(
            model=CTCConfig(
                encoder=EncoderConfig(
                    encoder_type="transformer", num_units=16, num_layers=2,
                    num_heads=2, conv_kernel_size=5, depthwise_impl="shifts",
                    sequence_shards=sp, sequence_data_parallel=dp,
                ),
                num_classes=6,
            ),
            frontend=FrontendConfig(add_deltas=False, use_energy=False),
        )

    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), _task())
    opt = build_optimizer("sgd")

    step1 = make_train_step(_task(), opt)
    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step1(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    step8 = make_train_step(_task(sp=2, dp=4), opt)
    mesh = make_mesh_dp_sp(4, 2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    # sp's weight base is replication -> plain fsdp placement on the 2-D
    # mesh; the data-axis extent (4), not the device count (8), is the
    # sharding degree
    p8, s8, b8 = setup_fsdp(mesh, p8, s8, batch)
    w = p8["encoder"]["conformer"]["layers"][0]["ff"]["in"]["w"]
    assert "data" in tuple(w.sharding.spec)
    assert "seq" not in tuple(w.sharding.spec)
    assert _sharded_fraction(p8) > 0.9

    p8, s8, aux8 = step8(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=2e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5)


def test_fit_fsdp_tp_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=2, toy_num_utts=24, toy_max_units=4,
        num_devices=8, num_model_shards=2, fsdp=True,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100,
                  print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_fit_rejects_fsdp_without_data_degree(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    # 8 devices all taken by tp leaves dp=1: nothing for ZeRO-3 to shard over
    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, batch_size=8, num_epoch=1,
        toy_num_utts=8, num_devices=8, num_model_shards=8, fsdp=True,
        use_delta=False, use_energy=False,
    )
    with pytest.raises(ValueError, match="data-parallel degree"):
        fit(exp, str(tmp_path / "m"), print_fn=lambda *a: None)
