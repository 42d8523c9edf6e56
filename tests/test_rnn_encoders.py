"""Unit tests for fused-gate scans and the encoder zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_end2end_speech_recognition_tpu.models.rnn import (
    RNNSpec,
    bidirectional_scan,
    init_bidirectional,
    init_rnn_params,
    rnn_scan,
)
from tensorflow_end2end_speech_recognition_tpu.models.encoders import (
    ENCODER_TYPES,
    EncoderConfig,
    apply_encoder,
    init_encoder,
)


def test_lstm_scan_matches_loop_oracle():
    """Fused scan == naive per-step numpy LSTM."""
    spec = RNNSpec(cell="lstm", num_units=5)
    key = jax.random.PRNGKey(0)
    params = init_rnn_params(key, spec, input_dim=3)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 3))
    lengths = jnp.asarray([7, 4])
    ys, (h_fin, c_fin) = rnn_scan(params, spec, xs, lengths)

    wx, wh, bias = np.asarray(params["wx"]), np.asarray(params["wh"]), np.asarray(params["b"])
    x = np.asarray(xs)
    for b in range(2):
        h = np.zeros(5)
        c = np.zeros(5)
        for t in range(int(lengths[b])):
            g = x[b, t] @ wx + h @ wh + bias
            i, f, gg, o = np.split(g, 4)
            sig = lambda v: 1 / (1 + np.exp(-v))
            c = sig(f + spec.forget_bias) * c + sig(i) * np.tanh(gg)
            h = sig(o) * np.tanh(c)
            # fp32 scan vs fp64 oracle: in fp64 the two agree to 3e-9
            # (verified offline); fp32 recurrence drift reaches ~2e-4 by t=7.
            np.testing.assert_allclose(np.asarray(ys[b, t]), h, atol=1e-3)
        np.testing.assert_allclose(np.asarray(h_fin[b]), h, atol=1e-3)
    # pad region zero
    assert np.all(np.asarray(ys[1, 4:]) == 0.0)


def test_lstm_length_invariance():
    """Outputs on the valid prefix must not depend on pad frames."""
    spec = RNNSpec(cell="lstm", num_units=4)
    params = init_rnn_params(jax.random.PRNGKey(0), spec, 3)
    x_short = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 3))
    x_long = jnp.concatenate([x_short, 99.0 * jnp.ones((1, 3, 3))], axis=1)
    y_short, _ = rnn_scan(params, spec, x_short, jnp.asarray([5]))
    y_long, _ = rnn_scan(params, spec, x_long, jnp.asarray([5]))
    np.testing.assert_allclose(np.asarray(y_short), np.asarray(y_long[:, :5]), atol=1e-6)
    # and for the backward direction
    pb = init_bidirectional(jax.random.PRNGKey(1), spec, 3)
    yb_s = bidirectional_scan(pb, spec, x_short, jnp.asarray([5]))
    yb_l = bidirectional_scan(pb, spec, x_long, jnp.asarray([5]))
    np.testing.assert_allclose(np.asarray(yb_s), np.asarray(yb_l[:, :5]), atol=1e-6)


def test_backward_scan_sees_future():
    """BLSTM backward half at t=0 must depend on the last valid frame."""
    spec = RNNSpec(cell="lstm", num_units=4)
    pb = init_bidirectional(jax.random.PRNGKey(3), spec, 2)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 2))
    y1 = bidirectional_scan(pb, spec, x, jnp.asarray([6]))
    x2 = x.at[0, 5].add(1.0)
    y2 = bidirectional_scan(pb, spec, x2, jnp.asarray([6]))
    # backward half (last out_dim dims) at t=0 changes; forward half doesn't
    assert not np.allclose(np.asarray(y1[0, 0, 4:]), np.asarray(y2[0, 0, 4:]))
    np.testing.assert_allclose(np.asarray(y1[0, 0, :4]), np.asarray(y2[0, 0, :4]))


def test_gru_and_options():
    spec = RNNSpec(cell="gru", num_units=6)
    params = init_rnn_params(jax.random.PRNGKey(5), spec, 3)
    ys, _ = rnn_scan(params, spec, jnp.ones((2, 4, 3)), jnp.asarray([4, 2]))
    assert ys.shape == (2, 4, 6)
    assert np.all(np.isfinite(np.asarray(ys)))
    # LSTM options: peephole + cell clip + projection
    spec2 = RNNSpec(cell="lstm", num_units=8, num_proj=3, use_peephole=True, clip_activation=5.0)
    p2 = init_rnn_params(jax.random.PRNGKey(6), spec2, 4)
    ys2, (h, c) = rnn_scan(p2, spec2, jnp.ones((1, 5, 4)), jnp.asarray([5]))
    assert ys2.shape == (1, 5, 3) and h.shape == (1, 3) and c.shape == (1, 8)


ENCODER_CASES = [
    ("blstm", {}, 2, 123),
    ("lstm", {}, 2, 123),
    ("bgru", {}, 2, 123),
    ("gru", {}, 2, 123),
    ("pyramidal_blstm", {}, 3, 123),
    ("vgg_blstm", {"input_channels": 3}, 2, 123),
    ("vgg_lstm", {"input_channels": 3}, 2, 123),
    ("cnn_zhang", {"input_channels": 3, "fc_units": (64,)}, 2, 123),
    ("multitask_blstm", {"num_layers_sub": 1}, 2, 123),
    ("multitask_lstm", {"num_layers_sub": 1}, 2, 123),
]


@pytest.mark.parametrize("enc_type,extra,layers,dim", ENCODER_CASES)
def test_encoder_shapes(enc_type, extra, layers, dim):
    cfg = EncoderConfig(encoder_type=enc_type, num_units=16, num_layers=layers, **extra)
    params = init_encoder(jax.random.PRNGKey(0), cfg, dim)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, dim))
    lengths = jnp.asarray([16, 9])
    out = apply_encoder(params, cfg, xs, lengths, train=False)
    assert out.outputs.shape[0] == 2
    assert out.outputs.shape[-1] == cfg.output_dim
    assert np.all(np.isfinite(np.asarray(out.outputs)))
    if enc_type in ("pyramidal_blstm",):
        assert out.outputs.shape[1] == 4  # 16 / 2^(3-1)
        np.testing.assert_array_equal(np.asarray(out.lengths), [4, 3])
    elif enc_type.startswith("vgg"):
        assert out.outputs.shape[1] == 4  # 16 / 4
        np.testing.assert_array_equal(np.asarray(out.lengths), [4, 3])
    else:
        assert out.outputs.shape[1] == 16
    if enc_type.startswith("multitask"):
        assert out.sub_outputs is not None
        assert out.sub_outputs.shape[1] == 16
    # pad region zeroed
    tl = int(out.lengths[1])
    assert np.all(np.asarray(out.outputs[1, tl:]) == 0.0)


def test_unknown_encoder_raises():
    with pytest.raises(ValueError, match="unknown encoder_type"):
        init_encoder(jax.random.PRNGKey(0), EncoderConfig(encoder_type="resnet"), 40)


def test_conformer_shapes_and_pad_invariance():
    import jax

    from tensorflow_end2end_speech_recognition_tpu.models.encoders import (
        EncoderConfig,
        apply_encoder,
        init_encoder,
    )

    cfg = EncoderConfig(encoder_type="conformer", num_units=32, num_layers=2,
                        num_heads=4, conv_kernel_size=7)
    params = init_encoder(jax.random.PRNGKey(0), cfg, 12)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12).astype(np.float32))
    lengths = jnp.asarray([10, 6])
    out = apply_encoder(params, cfg, x, lengths)
    assert out.outputs.shape == (2, 10, 32)
    # pad frames zeroed
    np.testing.assert_allclose(np.asarray(out.outputs[1, 6:]), 0.0, atol=1e-6)
    # valid outputs must not depend on how much padding follows
    x_long = jnp.concatenate([x, jnp.ones((2, 5, 12))], axis=1)
    out_long = apply_encoder(params, cfg, x_long, lengths)
    np.testing.assert_allclose(
        np.asarray(out_long.outputs[1, :6]), np.asarray(out.outputs[1, :6]),
        rtol=1e-4, atol=1e-5,
    )


def test_conformer_ctc_learns_toy_task():
    import jax

    from tensorflow_end2end_speech_recognition_tpu.data import Dataset, ToyCorpus
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
        CTCTaskConfig,
        init_params,
        make_train_step,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer

    corpus = ToyCorpus(num_utts=8, vocab_size=5, min_units=2, max_units=3, seed=11)
    ds = Dataset(corpus.utterances, batch_size=8, num_wav_buckets=1, num_label_buckets=1)
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="conformer", num_units=32,
                                  num_layers=1, num_heads=4, conv_kernel_size=7),
            num_classes=corpus.tokenizer.num_units,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
        num_stack=3, num_skip=3,
    )
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    step = make_train_step(task, opt)
    batch = {k: jnp.asarray(v) for k, v in next(ds.batches(0)).items() if k != "names"}
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(60):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, batch, 2e-3, sub)
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)


def test_transformer_shapes_and_pad_invariance():
    import jax

    from tensorflow_end2end_speech_recognition_tpu.models.encoders import (
        EncoderConfig,
        apply_encoder,
        init_encoder,
    )

    cfg = EncoderConfig(encoder_type="transformer", num_units=32, num_layers=2,
                        num_heads=4)
    params = init_encoder(jax.random.PRNGKey(0), cfg, 12)
    # transformer layers carry no conv module and a single FF
    layer = params["conformer"]["layers"][0]
    assert set(layer) == {"mhsa", "ff"}
    assert "ln_out" in params["conformer"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12).astype(np.float32))
    lengths = jnp.asarray([10, 6])
    out = apply_encoder(params, cfg, x, lengths)
    assert out.outputs.shape == (2, 10, 32)
    np.testing.assert_allclose(np.asarray(out.outputs[1, 6:]), 0.0, atol=1e-6)
    # valid outputs must not depend on how much padding follows
    x_long = jnp.concatenate([x, jnp.ones((2, 5, 12))], axis=1)
    out_long = apply_encoder(params, cfg, x_long, lengths)
    np.testing.assert_allclose(
        np.asarray(out_long.outputs[1, :6]), np.asarray(out.outputs[1, :6]),
        rtol=1e-4, atol=1e-5,
    )


def test_transformer_ctc_learns_toy_task():
    import jax

    from tensorflow_end2end_speech_recognition_tpu.data import Dataset, ToyCorpus
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
        CTCTaskConfig,
        init_params,
        make_train_step,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer

    corpus = ToyCorpus(num_utts=8, vocab_size=5, min_units=2, max_units=3, seed=11)
    ds = Dataset(corpus.utterances, batch_size=8, num_wav_buckets=1, num_label_buckets=1)
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="transformer", num_units=32,
                                  num_layers=1, num_heads=4),
            num_classes=corpus.tokenizer.num_units,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
        num_stack=3, num_skip=3,
    )
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    step = make_train_step(task, opt)
    batch = {k: jnp.asarray(v) for k, v in next(ds.batches(0)).items() if k != "names"}
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(60):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, batch, 2e-3, sub)
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)


def test_compute_dtype_bfloat16_from_yaml(tmp_path):
    """`compute_dtype: bfloat16` reaches the encoder and produces f32 outputs."""
    import yaml

    from tensorflow_end2end_speech_recognition_tpu.models.encoders import (
        apply_encoder,
        init_encoder,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump(dict(
        model_type="ctc", encoder_type="conformer", num_units=16, num_layers=2,
        num_heads=2, compute_dtype="bfloat16",
    )))
    cfg = ExperimentConfig.from_yaml(p).encoder_config()
    assert cfg.compute_dtype == "bfloat16"
    params = init_encoder(jax.random.PRNGKey(0), cfg, 8)
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 12, 8), jnp.float32)
    out = apply_encoder(params, cfg, xs, jnp.asarray([12, 7]))
    assert out.outputs.dtype == jnp.float32
    assert np.isfinite(np.asarray(out.outputs)).all()


def test_conformer_spec_validation():
    import pytest

    from tensorflow_end2end_speech_recognition_tpu.models.conformer import (
        ConformerSpec,
        init_conformer,
    )

    with pytest.raises(ValueError, match="divisible by num_heads"):
        init_conformer(jax.random.PRNGKey(0), ConformerSpec(dim=300, num_heads=8), 8)
    with pytest.raises(ValueError, match="even"):
        init_conformer(jax.random.PRNGKey(0), ConformerSpec(dim=15, num_heads=3), 8)


def test_depthwise_impls_equivalent():
    """The partition-safe 'shifts' depthwise conv (used on 2-D meshes,
    where the grouped conv's kernel grad silently zeroes — see
    ConformerSpec.depthwise_impl) is bit-equivalent to the grouped conv,
    for odd and even kernel widths, in values AND gradients."""
    import jax

    from tensorflow_end2end_speech_recognition_tpu.models.encoders import (
        EncoderConfig,
        apply_encoder,
        init_encoder,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 10, 12).astype(np.float32))
    lengths = jnp.asarray([10, 6])
    for k in (7, 4):
        cfg = EncoderConfig(encoder_type="conformer", num_units=32, num_layers=2,
                            num_heads=4, conv_kernel_size=k)
        cfg_s = cfg._replace(depthwise_impl="shifts")
        params = init_encoder(jax.random.PRNGKey(0), cfg, 12)
        out_c = apply_encoder(params, cfg, x, lengths).outputs
        out_s = apply_encoder(params, cfg_s, x, lengths).outputs
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-5)
        g_c = jax.grad(lambda p: jnp.sum(apply_encoder(p, cfg, x, lengths).outputs ** 2))(params)
        g_s = jax.grad(lambda p: jnp.sum(apply_encoder(p, cfg_s, x, lengths).outputs ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
