"""Frozen StableHLO export: artifact round-trips and matches direct inference."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.serving import (
    build_inference_fn,
    export_model,
    load_exported,
)
from tensorflow_end2end_speech_recognition_tpu.train import att_task, ctc_task


def _ctc_task():
    return ctc_task.CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=8, num_layers=1),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )


def test_export_ctc_greedy_roundtrip(tmp_path):
    task = _ctc_task()
    params = ctc_task.init_params(jax.random.PRNGKey(0), task)
    rng = np.random.RandomState(0)
    inputs = rng.randn(2, 4096).astype(np.float32) * 0.1
    lens = np.asarray([4096, 2048], np.int32)

    direct = build_inference_fn(task, ctc_task, params, beam_width=1)
    want_ids, want_len = (np.asarray(x) for x in direct(jnp.asarray(inputs), jnp.asarray(lens)))

    out = export_model(task, ctc_task, params, tmp_path / "m.shlo", 2, 4096)
    assert out.exists() and out.with_suffix(".shlo.json").exists()
    infer = load_exported(out)
    got_ids, got_len = infer(inputs, lens)
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_export_ctc_beam_roundtrip(tmp_path):
    task = _ctc_task()
    params = ctc_task.init_params(jax.random.PRNGKey(1), task)
    rng = np.random.RandomState(1)
    inputs = rng.randn(2, 4096).astype(np.float32) * 0.1
    lens = np.asarray([4096, 4096], np.int32)
    direct = build_inference_fn(task, ctc_task, params, beam_width=4)
    want_ids, want_len = (np.asarray(x) for x in direct(jnp.asarray(inputs), jnp.asarray(lens)))
    out = export_model(task, ctc_task, params, tmp_path / "b.shlo", 2, 4096, beam_width=4)
    got_ids, got_len = load_exported(out)(inputs, lens)
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_export_attention_greedy_roundtrip(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.models.attention import AttentionConfig
    from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import Seq2SeqConfig

    task = att_task.AttTaskConfig(
        model=Seq2SeqConfig(
            encoder=EncoderConfig(encoder_type="pyramidal_blstm", num_units=8,
                                  num_layers=2, num_pyramid_levels=1),
            attention=AttentionConfig(attention_type="hybrid", attention_dim=8,
                                      conv_num_channels=2, conv_width=5),
            num_classes=6, decoder_num_units=8, embedding_dim=4,
            max_decode_length=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    params = att_task.init_params(jax.random.PRNGKey(2), task)
    rng = np.random.RandomState(2)
    inputs = rng.randn(2, 4096).astype(np.float32) * 0.1
    lens = np.asarray([4096, 2048], np.int32)
    direct = build_inference_fn(task, att_task, params, beam_width=1)
    want_ids, want_len = (np.asarray(x) for x in direct(jnp.asarray(inputs), jnp.asarray(lens)))
    out = export_model(task, att_task, params, tmp_path / "a.shlo", 2, 4096)
    got_ids, got_len = load_exported(out)(inputs, lens)
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_export_ctc_beam_with_lm_fusion_roundtrip(tmp_path):
    """LM-fused beam decode freezes into the artifact (LM weights baked in)."""
    from tensorflow_end2end_speech_recognition_tpu.models.lm import LMConfig, init_lm

    task = _ctc_task()
    params = ctc_task.init_params(jax.random.PRNGKey(4), task)
    lm_cfg = LMConfig(vocab=task.model.num_classes + 2, num_units=8, embedding_dim=4)
    lm_params = init_lm(jax.random.PRNGKey(5), lm_cfg)
    rng = np.random.RandomState(4)
    inputs = rng.randn(2, 4096).astype(np.float32) * 0.1
    lens = np.asarray([4096, 4096], np.int32)

    direct = build_inference_fn(task, ctc_task, params, beam_width=4,
                                lm=(lm_params, lm_cfg), lm_weight=0.3)
    want_ids, want_len = (np.asarray(x) for x in direct(jnp.asarray(inputs), jnp.asarray(lens)))

    nolm = build_inference_fn(task, ctc_task, params, beam_width=4)
    nolm_ids, _ = (np.asarray(x) for x in nolm(jnp.asarray(inputs), jnp.asarray(lens)))
    # the LM must actually participate (fused and unfused can differ; at
    # minimum the graphs must both run — equality here is not required)

    out = export_model(task, ctc_task, params, tmp_path / "lm.shlo", 2, 4096,
                       beam_width=4, lm=(lm_params, lm_cfg), lm_weight=0.3)
    import json as _json

    meta = _json.loads(out.with_suffix(".shlo.json").read_text())
    assert meta["lm_weight"] == 0.3
    got_ids, got_len = load_exported(out)(inputs, lens)
    np.testing.assert_array_equal(np.asarray(got_len), want_len)
    np.testing.assert_array_equal(np.asarray(got_ids), want_ids)


def test_export_transducer_greedy_roundtrip(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.models.transducer import (
        TransducerConfig,
    )
    from tensorflow_end2end_speech_recognition_tpu.train import transducer_task

    task = transducer_task.TransducerTaskConfig(
        model=TransducerConfig(
            encoder=EncoderConfig(encoder_type="lstm", num_units=8, num_layers=1),
            num_classes=6, pred_num_units=8, embedding_dim=4, joint_dim=8,
            max_symbols_per_frame=2,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    params = transducer_task.init_params(jax.random.PRNGKey(5), task)
    rng = np.random.RandomState(5)
    inputs = rng.randn(2, 4096).astype(np.float32) * 0.1
    lens = np.asarray([4096, 2048], np.int32)

    direct = build_inference_fn(task, transducer_task, params, beam_width=1)
    want_ids, want_len = (
        np.asarray(x) for x in direct(jnp.asarray(inputs), jnp.asarray(lens))
    )
    out = export_model(task, transducer_task, params, tmp_path / "t.shlo", 2, 4096)
    infer = load_exported(out)
    got_ids, got_len = infer(inputs, lens)
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(got_ids, want_ids)
