"""Fully-sharded data parallelism (ZeRO-3) on the virtual 8-device mesh.

Correctness bar: FSDP placement must reproduce the plain-DP/single-device
train step bit-for-bit (same math, different residency) while parameters
AND optimizer moments are really sharded over ``data`` at rest — including
AFTER the donated update (no per-step resharding) — and the compiled step
contains the weight all-gather.
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
    fsdp_partition_specs,
    make_mesh,
    setup_fsdp,
)
from tensorflow_end2end_speech_recognition_tpu.parallel.fsdp import fsdp_spec_for
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def _setup(encoder_type="blstm", optimizer="sgd"):
    enc = dict(encoder_type=encoder_type, num_units=16, num_layers=2)
    if encoder_type in ("conformer", "transformer"):
        enc.update(num_heads=2, conv_kernel_size=5)
    task = CTCTaskConfig(
        model=CTCConfig(encoder=EncoderConfig(**enc), num_classes=6),
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
    opt = build_optimizer(optimizer)
    return task, opt, params, batch


def test_spec_picks_largest_divisible_axis():
    assert fsdp_spec_for(np.zeros((40, 64)), 8) == P(None, "data")
    assert fsdp_spec_for(np.zeros((64, 40)), 8) == P("data")
    assert fsdp_spec_for(np.zeros((16, 64)), 8) == P(None, "data")
    assert fsdp_spec_for(np.zeros((64,)), 8) == P("data")
    # indivisible / too small: replicate
    assert fsdp_spec_for(np.zeros((7,)), 8) == P()
    assert fsdp_spec_for(np.zeros((9, 7)), 8) == P()
    assert fsdp_spec_for(np.asarray(3.0), 8) == P()


def _run_case(encoder_type):
    task, opt, params, batch = _setup(encoder_type)
    step = make_train_step(task, opt)

    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    p1, s1, aux1 = step(p1, s1, batch, 1e-3, jax.random.PRNGKey(1))

    mesh = make_mesh(8)
    p8 = jax.tree.map(jnp.copy, params)
    s8 = opt.init(p8)
    p8, s8, b8 = setup_fsdp(mesh, p8, s8, batch)

    # state is REALLY sharded at rest: most param bytes live 1/8 per chip
    def sharded_fraction(tree):
        leaves = jax.tree.leaves(tree)
        total = sum(l.size for l in leaves)
        if not total:  # plain sgd: empty optax state, nothing to shard
            return 1.0
        return sum(l.size for l in leaves if l.sharding.spec != P()) / total

    assert sharded_fraction(p8) > 0.9
    assert sharded_fraction(s8) > 0.9  # moments (if any) follow params

    p8, s8, aux8 = step(p8, s8, b8, 1e-3, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5)
    for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=3e-5)
    # the donated update must KEEP the sharded placement (no resharding)
    assert sharded_fraction(p8) > 0.9


def test_fsdp_blstm_matches_single_device():
    _run_case("blstm")


def test_fsdp_conformer_matches_single_device():
    _run_case("conformer")


def test_fsdp_step_contains_weight_all_gather():
    task, opt, params, batch = _setup()
    mesh = make_mesh(8)
    s = opt.init(params)
    p8, s8, b8 = setup_fsdp(mesh, params, s, batch)
    step = make_train_step(task, opt)
    txt = step.lower(p8, s8, b8, 1e-3, jax.random.PRNGKey(1)).compile().as_text()
    assert "all-gather" in txt


def test_opt_state_moments_follow_params():
    task, _, params, batch = _setup(optimizer="adam")
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    mesh = make_mesh(8)
    s = opt.init(params)
    p8, s8, _ = setup_fsdp(mesh, params, s, batch)
    flat = jax.tree_util.tree_flatten_with_path(s8)[0]
    wh_mu = [l for path, l in flat
             if "'wh'" in str(path) and "mu" in str(path)]
    assert wh_mu and all(l.sharding.spec == P(None, "data") for l in wh_mu)
    counts = [l for path, l in flat if "count" in str(path)]
    assert counts and all(l.sharding.spec == P() for l in counts)


def test_fit_fsdp_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        model_type="ctc", label_type="phone61", encoder_type="blstm",
        num_units=16, num_layers=1, batch_size=8, num_epoch=2,
        toy_num_utts=24, toy_max_units=4, num_devices=8, fsdp=True,
        use_delta=False, use_energy=False,
    )
    summary = fit(exp, str(tmp_path / "m"), log_every=100, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])
    assert summary["epochs"] == 2


def test_fit_rejects_fsdp_combinations(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    base = dict(model_type="ctc", label_type="phone61", encoder_type="conformer",
                num_units=16, num_layers=1, num_heads=2, batch_size=8,
                num_epoch=1, toy_num_utts=8, use_delta=False, use_energy=False)
    # pipeline weights live inside shard_map, outside GSPMD placement;
    # tp/sp/ep compose (tests/test_fsdp_composite.py)
    with pytest.raises(ValueError, match="cannot combine"):
        fit(ExperimentConfig(num_devices=8, fsdp=True, num_pipeline_stages=2,
                             **{**base, "num_layers": 2}),
            str(tmp_path / "a"), print_fn=lambda *a: None)
    with pytest.raises(ValueError, match="data-parallel degree"):
        fit(ExperimentConfig(fsdp=True, **base),
            str(tmp_path / "b"), print_fn=lambda *a: None)
