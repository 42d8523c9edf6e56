"""Chunk-causal conformer/transformer streaming: chunked == offline.

The offline stack with ``left_context >= 0`` is causal (windowed attention
+ left-padded conv), so the per-chunk KV/conv-cache step
(models/conformer_stream.py) must reproduce the offline greedy decode
EXACTLY — including mid-stream stream ends, pauses, stacking, and both
position schemes that stream (absolute, rotary).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.conformer import (
    ConformerSpec,
    apply_conformer,
    init_conformer,
)
from tensorflow_end2end_speech_recognition_tpu.models.conformer_stream import (
    conformer_cache_init,
    conformer_stream_step,
)
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.streaming import build_streaming_fn
from tensorflow_end2end_speech_recognition_tpu.train import ctc_task

from test_streaming import _offline, _stream_all  # shared chunked-drive helpers


def _task(encoder_type="conformer", pos="rotary", num_stack=1, num_skip=1):
    return ctc_task.CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(
                encoder_type=encoder_type, num_units=16, num_layers=2,
                num_heads=2, conv_kernel_size=5, pos_encoding=pos,
                left_context=8,
            ),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False, cmvn="none"),
        num_stack=num_stack, num_skip=num_skip,
    )


@pytest.mark.parametrize("block,pos", [
    ("conformer", "rotary"), ("conformer", "absolute"),
    ("transformer", "rotary"),
])
def test_chunked_stack_equals_offline(block, pos):
    """Layer-level equality at mixed row lengths across 4 chunks."""
    spec = ConformerSpec(dim=16, num_layers=2, num_heads=2, conv_kernel_size=5,
                         block=block, pos_encoding=pos, left_context=6)
    params = init_conformer(jax.random.PRNGKey(0), spec, 12)
    rng = np.random.RandomState(0)
    b, t, f = 3, 20, 5
    xs = jnp.asarray(rng.randn(b, t, 12).astype(np.float32))
    lens = np.asarray([20, 13, 7])
    off = np.asarray(apply_conformer(params, spec, xs, jnp.asarray(lens)))
    cache = conformer_cache_init(spec, b)
    fed = np.zeros(b, np.int64)
    for c in range(t // f):
        n_new = jnp.asarray(np.clip(lens - fed, 0, f).astype(np.int32))
        out, cache = conformer_stream_step(
            params, spec, cache, xs[:, c * f : (c + 1) * f], n_new)
        out = np.asarray(out)
        for bi in range(b):
            n = int(n_new[bi])
            if n:
                np.testing.assert_allclose(
                    out[bi, :n], off[bi, fed[bi] : fed[bi] + n], atol=2e-4,
                    err_msg=f"{block}/{pos} row {bi} chunk {c}")
        fed += np.asarray(n_new)


@pytest.mark.parametrize("encoder_type", ["conformer", "transformer"])
def test_streaming_conformer_equals_offline(encoder_type):
    task = _task(encoder_type)
    params = ctc_task.init_params(jax.random.PRNGKey(0), task)
    rng = np.random.RandomState(0)
    b, n = 3, 16000
    wav = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.3)
    wav_len = jnp.asarray([n, 9600, 4640], jnp.int32)
    want_ids, want_len = (np.asarray(x) for x in _offline(task, params, wav, wav_len))
    got = _stream_all(task, params, wav, wav_len, chunk=3200)
    for i in range(b):
        assert got[i] == want_ids[i, : want_len[i]].tolist(), f"row {i}"


def test_streaming_conformer_chunk_size_invariance():
    task = _task()
    params = ctc_task.init_params(jax.random.PRNGKey(1), task)
    wav = jnp.asarray(np.random.RandomState(2).randn(2, 12800).astype(np.float32) * 0.3)
    wav_len = jnp.asarray([12800, 8000], jnp.int32)
    a = _stream_all(task, params, wav, wav_len, chunk=1600)
    c = _stream_all(task, params, wav, wav_len, chunk=6400)
    assert a == c


def test_streaming_conformer_stacked_equals_offline():
    task = _task(num_stack=3, num_skip=3)
    params = ctc_task.init_params(jax.random.PRNGKey(3), task)
    rng = np.random.RandomState(4)
    b, n = 2, 16000
    wav = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.3)
    wav_len = jnp.asarray([n, 9600], jnp.int32)
    want_ids, want_len = (np.asarray(x) for x in _offline(task, params, wav, wav_len))
    got = _stream_all(task, params, wav, wav_len, chunk=3200)
    for i in range(b):
        assert got[i] == want_ids[i, : want_len[i]].tolist(), f"row {i}"


def test_streaming_conformer_beam_equals_offline_beam():
    """The carried prefix beam composes with the conformer cache."""
    from tensorflow_end2end_speech_recognition_tpu.decoding.ctc_prefix_beam import (
        ctc_prefix_beam_search,
    )
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import apply_ctc
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import device_pipeline

    task = _task()
    params = ctc_task.init_params(jax.random.PRNGKey(5), task)
    rng = np.random.RandomState(6)
    b, n, w = 2, 9600, 4
    wav = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.3)
    wav_len = jnp.asarray([n, 6400], jnp.int32)

    feats, fl = device_pipeline(task, {"inputs": wav, "input_len": wav_len})
    out = apply_ctc(params, task.model, feats, fl)
    w_prefixes, w_lengths, w_scores = ctc_prefix_beam_search(
        out.logits, out.logit_len, task.model.blank_id, beam_width=w)

    init_fn, step_fn, finalize_fn = build_streaming_fn(
        task, params, 3200, beam_width=w)
    step_fn = jax.jit(step_fn)
    state = init_fn(b)
    for k in range(n // 3200):
        lo = k * 3200
        cl = np.clip(np.asarray(wav_len) - lo, 0, 3200).astype(np.int32)
        state, _, _ = step_fn(state, wav[:, lo : lo + 3200], jnp.asarray(cl))
    prefixes, lengths, scores = finalize_fn(state)
    np.testing.assert_array_equal(np.asarray(lengths), np.asarray(w_lengths))
    for i in range(b):
        L = int(np.asarray(w_lengths)[i, 0])
        np.testing.assert_array_equal(
            np.asarray(prefixes)[i, 0, :L], np.asarray(w_prefixes)[i, 0, :L])
    np.testing.assert_allclose(np.asarray(scores), np.asarray(w_scores),
                               atol=1e-3)


def test_streaming_conformer_pause_freezes_state():
    task = _task()
    params = ctc_task.init_params(jax.random.PRNGKey(7), task)
    init_fn, step_fn = build_streaming_fn(task, params, 3200)
    step_fn = jax.jit(step_fn)
    wav = jnp.asarray(np.random.RandomState(8).randn(2, 3200).astype(np.float32))
    state = init_fn(2)
    state, _, _ = step_fn(state, wav, jnp.asarray([3200, 3200], jnp.int32))
    # row 1 pauses: its caches must stay bit-identical
    before = jax.tree.leaves(state.conformer)
    state2, toks, tl = step_fn(state, wav, jnp.asarray([3200, 0], jnp.int32))
    after = jax.tree.leaves(state2.conformer)
    for x, y in zip(before, after):
        if np.asarray(x).ndim:
            np.testing.assert_array_equal(np.asarray(x)[1], np.asarray(y)[1])
    assert int(tl[1]) == 0


def test_streaming_conformer_export_roundtrip(tmp_path):
    """Frozen StableHLO streaming artifact: the conformer KV/conv caches
    ride the generic state_leaves contract unchanged."""
    from tensorflow_end2end_speech_recognition_tpu.serving import (
        export_streaming_model,
        load_streaming,
    )

    task = _task()
    params = ctc_task.init_params(jax.random.PRNGKey(2), task)
    rng = np.random.RandomState(2)
    b, chunk = 2, 3200
    wav = jnp.asarray(rng.randn(b, 3 * chunk).astype(np.float32) * 0.3)
    wav_len = jnp.asarray([3 * chunk, 2 * chunk - 800], jnp.int32)
    want = _stream_all(task, params, wav, wav_len, chunk)

    out = export_streaming_model(task, params, tmp_path / "s.shlo", b, chunk)
    state, step, finalize = load_streaming(out)
    assert finalize is None
    got = [[] for _ in range(b)]
    wav_np = np.asarray(wav)
    for k in range(3):
        lo = k * chunk
        cl = np.clip(np.asarray(wav_len) - lo, 0, chunk).astype(np.int32)
        state, tokens, tok_len = step(state, wav_np[:, lo : lo + chunk], cl)
        tokens, tok_len = np.asarray(tokens), np.asarray(tok_len)
        for i in range(b):
            got[i].extend(tokens[i, : tok_len[i]].tolist())
    assert got == want


def test_conformer_transducer_streaming_equals_offline():
    """The streaming-ASR workhorse: chunk-causal conformer encoder +
    RNN-Transducer. Chunked greedy (KV/conv caches + carried g/prediction
    state) must emit exactly the offline transducer decode."""
    from tensorflow_end2end_speech_recognition_tpu.decoding.transducer_greedy import (
        transducer_greedy_decode,
    )
    from tensorflow_end2end_speech_recognition_tpu.models.transducer import (
        TransducerConfig,
        encode,
    )
    from tensorflow_end2end_speech_recognition_tpu.train import transducer_task
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import device_pipeline

    task = transducer_task.TransducerTaskConfig(
        model=TransducerConfig(
            encoder=EncoderConfig(
                encoder_type="conformer", num_units=16, num_layers=2,
                num_heads=2, conv_kernel_size=5, pos_encoding="rotary",
                left_context=8,
            ),
            num_classes=6, pred_num_units=16, embedding_dim=8, joint_dim=16,
            max_symbols_per_frame=3,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False, cmvn="none"),
        num_stack=3, num_skip=3,
    )
    params = transducer_task.init_params(jax.random.PRNGKey(0), task)
    rng = np.random.RandomState(1)
    b, n = 3, 16000
    wav = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.3)
    wav_len = jnp.asarray([n, 9600, 4640], jnp.int32)

    feats, fl = device_pipeline(task, {"inputs": wav, "input_len": wav_len})
    out = encode(params, task.model, feats, fl)
    want_ids, want_len = (
        np.asarray(x)
        for x in transducer_greedy_decode(params, task.model, out.f_proj, out.enc_len)
    )
    got = _stream_all(task, params, wav, wav_len, chunk=3200)
    for i in range(b):
        assert got[i] == want_ids[i, : want_len[i]].tolist(), f"row {i}"


def test_streaming_validation():
    with pytest.raises(ValueError, match="left_context"):
        build_streaming_fn(
            _task()._replace(model=CTCConfig(
                encoder=EncoderConfig(encoder_type="conformer", num_units=16,
                                      num_layers=2, num_heads=2),
                num_classes=6)),
            {}, 3200)
    with pytest.raises(ValueError, match="relative"):
        build_streaming_fn(_task(pos="relative"), {}, 3200)
