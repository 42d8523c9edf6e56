"""Pipeline parallelism (parallel/pp.py) on the virtual 8-device mesh.

Correctness bar: the staged GPipe pipeline must reproduce the sequential
conformer/transformer apply (and its gradients, and the full CTC train
step) to float tolerance, on both a 1-D ``pipe`` mesh and the 2-D
``data x pipe`` mesh — while actually sharding each stage's layer weights
over the pipe axis.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from jax.sharding import PartitionSpec as P

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.conformer import (
    ConformerSpec,
    apply_conformer,
    init_conformer,
)
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.parallel import (
    apply_conformer_pipelined,
    make_mesh_dp_pp,
    make_mesh_pp,
    pipeline_param_specs,
    pp_stack_tree,
    pp_unstack_tree,
    setup_pipeline_parallel,
)
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer


def _spec(block="conformer"):
    return ConformerSpec(dim=16, num_layers=4, num_heads=2, conv_kernel_size=5,
                         block=block, depthwise_impl="shifts")


def _data(b=8, t=20, d=12, seed=0):
    rng = np.random.RandomState(seed)
    xs = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    lens = jnp.asarray(rng.randint(t // 3, t + 1, b).astype(np.int32))
    return xs, lens


def test_pipelined_forward_matches_sequential():
    for block in ("conformer", "transformer"):
        spec = _spec(block)
        params = init_conformer(jax.random.PRNGKey(0), spec, 12)
        xs, lens = _data()
        want = apply_conformer(params, spec, xs, lens)
        got = apply_conformer_pipelined(
            params, spec, xs, lens, make_mesh_pp(4), num_microbatches=4
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5, err_msg=block)


def test_pipelined_grads_match_sequential_incl_dp():
    spec = _spec()
    params = init_conformer(jax.random.PRNGKey(0), spec, 12)
    xs, lens = _data(seed=1)
    ct = jnp.asarray(np.random.RandomState(2).randn(8, 20, 16).astype(np.float32))

    g_seq = jax.grad(lambda p: jnp.sum(apply_conformer(p, spec, xs, lens) * ct))(params)
    mesh = make_mesh_pp(4)
    g_pp = jax.grad(lambda p: jnp.sum(apply_conformer_pipelined(
        p, spec, xs, lens, mesh, num_microbatches=4) * ct))(params)
    mesh2 = make_mesh_dp_pp(2, 4)
    g_dp_pp = jax.grad(lambda p: jnp.sum(apply_conformer_pipelined(
        p, spec, xs, lens, mesh2, num_microbatches=4, data_axis="data") * ct))(params)

    for got in (g_pp, g_dp_pp):
        for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, rtol=1e-4)


def _task(pipeline=False):
    enc = EncoderConfig(
        encoder_type="conformer", num_units=16, num_layers=4, num_heads=2,
        conv_kernel_size=5, depthwise_impl="shifts",
        pipeline_stages=4 if pipeline else None,
        pipeline_microbatches=4, pipeline_data_parallel=2 if pipeline else 1,
    )
    return CTCTaskConfig(
        model=CTCConfig(encoder=enc, num_classes=6),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
        num_stack=3, num_skip=3,
    )


def _batch(b=8, seed=3):
    rng = np.random.RandomState(seed)
    return {
        "inputs": jnp.asarray(rng.randn(b, 4096).astype(np.float32) * 0.1),
        "input_len": jnp.full((b,), 4096, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 6, (b, 4)).astype(np.int32)),
        "label_len": jnp.full((b,), 4, jnp.int32),
    }


def test_pp_train_step_matches_single_device():
    """Full dp2 x pipe4 CTC train step == the sequential single-device step,
    with the stage weights really sharded over the pipe axis."""
    params = init_params(jax.random.PRNGKey(0), _task())
    opt = build_optimizer("sgd", clip_grad_norm=None)
    batch = _batch()

    p1 = jax.tree.map(jnp.copy, params)
    s1 = opt.init(p1)
    step1 = make_train_step(_task(), opt)
    p1, s1, aux1 = step1(p1, s1, batch, 1e-2, jax.random.PRNGKey(1))

    mesh = make_mesh_dp_pp(2, 4)
    p8 = pp_stack_tree(jax.tree.map(jnp.copy, params), 4)
    s8 = pp_stack_tree(opt.init(jax.tree.map(jnp.copy, params)), 4)
    p8, s8, b8 = setup_pipeline_parallel(mesh, p8, s8, batch)
    step8 = make_train_step(_task(pipeline=True), opt)
    p8, s8, aux8 = step8(p8, s8, b8, 1e-2, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=1e-5)
    got = pp_unstack_tree(p8)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # stage weights are actually sharded over pipe (one stage per chip pair)
    w = jax.tree.leaves(p8["encoder"]["conformer"]["layers"])[0]
    assert w.sharding.spec == P("pipe"), w.sharding
    assert len(w.sharding.device_set) == 8, w.sharding


def test_pp_stack_unstack_roundtrip_through_opt_state():
    params = init_params(jax.random.PRNGKey(0), _task())
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    stacked_p = pp_stack_tree(params, 2)
    stacked_s = pp_stack_tree(opt_state, 2)
    # the stacked layout replaces the per-layer list with [S, L/S, ...] leaves
    assert not isinstance(stacked_p["encoder"]["conformer"]["layers"], list)
    specs = pipeline_param_specs(stacked_p)
    layer_specs = {
        str(s) for s in jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, P))
    }
    assert str(P("pipe")) in layer_specs
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(pp_unstack_tree(stacked_p))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(pp_unstack_tree(stacked_s))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_with_pipeline_stages_and_eval_cli(tmp_path, capsys):
    """`num_pipeline_stages:` end to end: fit() trains over the dp x pipe
    mesh, checkpoints land in the universal list layout, and the eval CLI
    restores + scores them."""
    from tensorflow_end2end_speech_recognition_tpu.bin import eval as eval_bin
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig.from_dict(dict(
        model_type="ctc", corpus="toy", label_type="phone61",
        toy_num_utts=16, toy_vocab_size=5, use_delta=False, use_energy=False,
        cmvn="none", encoder_type="conformer", num_units=16, num_layers=4,
        num_heads=2, conv_kernel_size=5, batch_size=8, num_epoch=2,
        num_devices=8, num_pipeline_stages=4, num_pipeline_microbatches=4,
    ))
    mdir = tmp_path / "model"
    summary = fit(cfg, mdir, print_fn=lambda *a: None)
    assert np.isfinite(summary["train_loss"])

    # the saved checkpoint restores into the ordinary list-layout tree:
    # the eval CLI rebuilds the model from the saved config on this (8-dev)
    # topology and scores every split
    eval_bin.main([str(mdir)])
    out = capsys.readouterr().out
    assert "dev (epoch" in out and "test (epoch" in out
