"""Mixture-of-Experts feed-forward + expert parallelism.

Correctness bars: (1) the dense-evaluation MoE FF equals a per-expert
Python-loop oracle; (2) the Switch load-balance aux statistic is exactly
1.0 under uniform routing; (3) a dp x ep 2-D mesh reproduces the
single-device train step while the stacked expert banks are really sharded
P("expert", ...) (parallel/ep.py); (4) config validation rejects the
unsupported combinations loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.conformer import (
    ConformerSpec,
    _ln,
    _moe_ff,
    _moe_init,
    apply_conformer,
    init_conformer,
)
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import (
    EncoderConfig,
    apply_encoder,
    init_encoder,
)
from tensorflow_end2end_speech_recognition_tpu.parallel import (
    expert_partition_specs,
    make_mesh_dp_ep,
    setup_expert_parallel,
)
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def _spec(**kw):
    base = dict(dim=16, num_layers=2, num_heads=2, conv_kernel_size=5,
                moe_experts=4, moe_top_k=2)
    base.update(kw)
    return ConformerSpec(**base)


def _moe_oracle(p, x, mask, spec):
    """Per-expert Python loop restatement of _moe_ff's combine."""
    y = _ln(p["ln"], x)
    logits = y @ p["router"]["w"]
    probs = jax.nn.softmax(logits, axis=-1)
    k, n = min(spec.moe_top_k, spec.moe_experts), spec.moe_experts
    if k < n:
        thresh = jax.lax.top_k(probs, k)[0][..., -1:]
        gates = jnp.where(probs >= thresh, probs, 0.0)
        gates = gates / jnp.sum(gates, -1, keepdims=True)
    else:
        gates = probs
    out = jnp.zeros_like(x)
    for e in range(n):
        h = jax.nn.swish(y @ p["in"]["w"][e] + p["in"]["b"][e])
        out = out + gates[..., e : e + 1] * (h @ p["out"]["w"][e] + p["out"]["b"][e])
    return out


def test_moe_ff_matches_per_expert_oracle():
    spec = _spec()
    p = _moe_init(jax.random.PRNGKey(0), spec)
    # non-trivial router so the top-k actually selects
    p["router"]["w"] = jax.random.normal(jax.random.PRNGKey(7), p["router"]["w"].shape)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 10, 16).astype(np.float32))
    mask = jnp.arange(10)[None, :] < jnp.asarray([10, 6, 4])[:, None]
    out, aux = _moe_ff(p, x, mask, spec)
    want = _moe_oracle(p, x, mask, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
    assert np.isfinite(float(aux))


def test_top1_gates_are_one_hot():
    spec = _spec(moe_top_k=1)
    p = _moe_init(jax.random.PRNGKey(0), spec)
    p["router"]["w"] = jax.random.normal(jax.random.PRNGKey(3), p["router"]["w"].shape)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 6, 16).astype(np.float32))
    mask = jnp.ones((2, 6), bool)
    out, _ = _moe_ff(p, x, mask, spec)
    want = _moe_oracle(p, x, mask, spec)  # oracle renormalizes top-1 to 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_aux_is_one_under_uniform_routing():
    """Switch balance statistic: uniform probs -> E * sum_e f_e/E = 1."""
    spec = _spec()
    p = _moe_init(jax.random.PRNGKey(0), spec)
    p["router"]["w"] = jnp.zeros_like(p["router"]["w"])  # exactly uniform
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 16).astype(np.float32))
    mask = jnp.arange(8)[None, :] < jnp.asarray([8, 5])[:, None]
    _, aux = _moe_ff(p, x, mask, spec)
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_apply_conformer_returns_weighted_mean_aux():
    spec = _spec(moe_aux_weight=0.5)
    params = init_conformer(jax.random.PRNGKey(0), spec, 20)
    for lp in params["layers"]:
        lp["moe"]["router"]["w"] = jnp.zeros_like(lp["moe"]["router"]["w"])
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 8, 20).astype(np.float32))
    out, aux = apply_conformer(params, spec, xs, jnp.asarray([8, 6]), return_aux=True)
    # uniform routers: every layer's aux is 1.0 -> weighted mean = 0.5
    np.testing.assert_allclose(float(aux), 0.5, rtol=1e-6)
    assert out.shape == (2, 8, 16)


def test_encoder_output_carries_aux():
    cfg = EncoderConfig(encoder_type="transformer", num_units=16, num_layers=2,
                        num_heads=2, moe_experts=4)
    params = init_encoder(jax.random.PRNGKey(0), cfg, 20)
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 8, 20).astype(np.float32))
    enc = apply_encoder(params, cfg, xs, jnp.asarray([8, 6]))
    assert enc.aux_loss is not None and np.isfinite(float(enc.aux_loss))
    dense = EncoderConfig(encoder_type="transformer", num_units=16,
                          num_layers=2, num_heads=2)
    dp = init_encoder(jax.random.PRNGKey(0), dense, 20)
    assert apply_encoder(dp, dense, xs, jnp.asarray([8, 6])).aux_loss is None


def _setup_task(ep_experts=4):
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="conformer", num_units=16,
                                  num_layers=2, num_heads=2, conv_kernel_size=5,
                                  moe_experts=ep_experts),
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
    opt = build_optimizer("sgd")
    return task, opt, params, batch


def test_expert_partition_specs_rules():
    task, _, params, _ = _setup_task()
    specs = expert_partition_specs(params)
    moe = specs["encoder"]["conformer"]["layers"][0]["moe"]
    assert moe["in"]["w"] == P("expert")
    assert moe["in"]["b"] == P("expert")
    assert moe["out"]["w"] == P("expert")
    assert moe["router"]["w"] == P()
    assert specs["encoder"]["conformer"]["layers"][0]["mhsa"]["q"]["w"] == P()
    assert specs["head"]["w"] == P()


def test_ep_matches_single_device():
    task, opt, params, batch = _setup_task()
    step = make_train_step(task, opt)

    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    mesh = make_mesh_dp_ep(4, 2)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_expert_parallel(mesh, p8, s8, batch)
    ew = p8["encoder"]["conformer"]["layers"][0]["moe"]["in"]["w"]
    assert ew.sharding.spec == P("expert")
    assert {s.data.shape[0] for s in ew.addressable_shards} == {2}  # 4/2 experts
    p8, s8, aux8 = step(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5)
    # atol looser than the tp/sp twins (2e-5): the expert-combine einsum is
    # genuinely CONTRACTED over the sharded E axis, so its partial sums
    # reduce in a different order under ep (measured max drift 9e-5 after
    # one sgd step); tp/sp keep that contraction local per chip
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=3e-4)
    # updated expert banks keep their placement (donated through)
    ew2 = p8["encoder"]["conformer"]["layers"][0]["moe"]["in"]["w"]
    assert ew2.sharding.spec == P("expert")
    assert len(ew2.sharding.device_set) == 8


def test_fit_moe_expert_parallel_end_to_end(tmp_path):
    """fit() with moe_num_experts=4 num_expert_shards=2 trains over the
    4x2 (data, expert) virtual mesh; train loss includes the aux term."""
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="conformer",
        num_units=16, num_layers=1, num_heads=2, conv_kernel_size=5,
        batch_size=8, num_epoch=2, toy_num_utts=24, toy_max_units=4,
        num_devices=8, moe_num_experts=4, num_expert_shards=2,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_config_validation():
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    common = dict(model_type="ctc", label_type="phone61", num_units=16,
                  num_layers=2, num_heads=2)
    with pytest.raises(ValueError, match="conformer"):
        ExperimentConfig(encoder_type="blstm", moe_num_experts=4,
                         **common).encoder_config()
    with pytest.raises(ValueError, match="no expert bank"):
        ExperimentConfig(encoder_type="conformer", num_expert_shards=2,
                         **common).encoder_config()
    with pytest.raises(ValueError, match="not divisible"):
        ExperimentConfig(encoder_type="conformer", moe_num_experts=4,
                         num_expert_shards=3, **common).encoder_config()
    with pytest.raises(ValueError, match="pipeline"):
        ExperimentConfig(encoder_type="conformer", moe_num_experts=4,
                         num_pipeline_stages=2, **common).encoder_config()
