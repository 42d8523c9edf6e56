"""Golden-value tests for the acoustic frontend against a numpy oracle.

The oracle re-implements framing / windowed rfft / mel / deltas / CMVN the
slow obvious way (the behaviour of the reference's offline feature pipeline,
SURVEY.md §2.9) and the fused matmul-DFT frontend must match it closely.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tensorflow_end2end_speech_recognition_tpu.frontend import (
    FrontendConfig,
    add_deltas,
    cmvn_utterance,
    extract_features,
    frame_signal,
    log_mel_spectrogram,
)
from tensorflow_end2end_speech_recognition_tpu.frontend.features import (
    _mel_matrix,
    _window_fn,
)


def _oracle_logmel(wav, cfg: FrontendConfig):
    # pre-emphasis
    w = wav.astype(np.float64).copy()
    w[1:] = w[1:] - cfg.preemphasis * w[:-1]
    w[0] = w[0] * (1 - cfg.preemphasis)
    n, step, flen = len(w), cfg.frame_step, cfg.frame_length
    t = max(0, 1 + (n - flen) // step)
    win = _window_fn(cfg.window, flen)
    frames = np.stack([w[i * step : i * step + flen] for i in range(t)])
    spec = np.fft.rfft(frames * win[None, :], n=cfg.fft_length)
    power = np.abs(spec) ** 2
    mel = power @ np.asarray(_mel_matrix(cfg), dtype=np.float64)
    out = np.log(np.maximum(mel, cfg.log_floor))
    if cfg.use_energy:
        e = np.log(np.maximum(np.sum(frames * frames, axis=1), cfg.log_floor))
        out = np.concatenate([e[:, None], out], axis=1)
    return out


@pytest.fixture
def wav():
    rng = np.random.RandomState(0)
    t = np.arange(16000 * 2) / 16000.0
    sig = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1320 * t)
        + 0.05 * rng.randn(len(t))
    )
    return sig.astype(np.float32)


def test_frame_signal_shape(wav):
    cfg = FrontendConfig()
    frames = frame_signal(jnp.asarray(wav), cfg)
    t = 1 + (len(wav) - cfg.frame_length) // cfg.frame_step
    assert frames.shape == (t, cfg.frame_length)
    np.testing.assert_allclose(
        np.asarray(frames[3]),
        wav[3 * cfg.frame_step : 3 * cfg.frame_step + cfg.frame_length],
    )


def test_logmel_matches_fft_oracle(wav):
    cfg = FrontendConfig(use_energy=True)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg))
    oracle = _oracle_logmel(wav, cfg)
    assert ours.shape == oracle.shape == (198, 41)
    # matmul-DFT in fp32 vs numpy fft in fp64: perceptually loud bins must agree
    # tightly; bins far below the frame max suffer fp32 cancellation and only
    # need loose agreement (they carry no information after CMVN).
    err = np.abs(ours - oracle)
    frame_max = oracle.max(axis=1, keepdims=True)
    loud = oracle > frame_max - 20 * np.log(10) / 10  # within 20 dB of max
    assert err[loud].max() < 0.03
    assert err.max() < 0.5


def test_deltas_match_oracle():
    rng = np.random.RandomState(1)
    x = rng.randn(10, 4).astype(np.float32)
    out = np.asarray(add_deltas(jnp.asarray(x), window=2))
    assert out.shape == (10, 12)
    # oracle delta with edge padding
    xp = np.pad(x, ((2, 2), (0, 0)), mode="edge")
    denom = 2.0 * (1 + 4)
    d = np.zeros_like(x)
    for k in (1, 2):
        d += k * (xp[2 + k : 2 + k + 10] - xp[2 - k : 2 - k + 10])
    d /= denom
    np.testing.assert_allclose(out[:, 4:8], d, atol=1e-5)


def test_cmvn_masked_stats():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 20, 8).astype(np.float32) * 3 + 1.5
    lens = np.array([20, 12])
    out = np.asarray(cmvn_utterance(jnp.asarray(x), jnp.asarray(lens)))
    for b, L in enumerate(lens):
        valid = out[b, :L]
        np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(valid.std(axis=0), 1.0, atol=1e-2)
        np.testing.assert_allclose(out[b, L:], 0.0)


def test_extract_features_batched(wav):
    cfg = FrontendConfig()
    batch = jnp.stack([jnp.asarray(wav), jnp.zeros_like(jnp.asarray(wav))])
    lens = jnp.asarray([len(wav), 8000])
    feats, feat_len = extract_features(batch, lens, cfg)
    assert feats.shape == (2, 198, cfg.feature_dim)
    assert cfg.feature_dim == 123  # 40 mel + energy, x3 with deltas
    np.testing.assert_array_equal(np.asarray(feat_len), [198, 48])
    # padded region of utt 1 must be zero
    assert np.all(np.asarray(feats[1, 48:]) == 0.0)


def test_mfcc_matches_dct_oracle(wav):
    cfg = FrontendConfig(feature_type="mfcc", num_ceps=13, use_energy=False)
    from tensorflow_end2end_speech_recognition_tpu.frontend.features import _dct_matrix

    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg))
    assert ours.shape[-1] == 13
    fb_cfg = FrontendConfig(use_energy=False)
    logmel = np.asarray(log_mel_spectrogram(jnp.asarray(wav), fb_cfg))
    oracle = logmel @ np.asarray(_dct_matrix(cfg))
    np.testing.assert_allclose(ours, oracle, atol=1e-3)
    assert cfg.feature_dim == 39  # 13 x3 deltas


def test_speaker_cmvn_stats_match_numpy_oracle():
    """Per-speaker stats from the device sweep == grouping features by
    speaker in float64 numpy; application normalizes each utterance with its
    own speaker's corpus-level stats."""
    from tensorflow_end2end_speech_recognition_tpu.data import Dataset, ToyCorpus
    from tensorflow_end2end_speech_recognition_tpu.frontend.speaker_cmvn import (
        GLOBAL_KEY,
        compute_speaker_stats,
    )
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
        CTCTaskConfig,
        device_pipeline,
    )

    corpus = ToyCorpus(num_utts=8, vocab_size=4, min_units=2, max_units=3,
                       num_speakers=2, seed=5)
    cfg = FrontendConfig(add_deltas=False, use_energy=False, cmvn="speaker")
    stats = compute_speaker_stats(corpus.utterances, cfg, batch_size=4)
    assert set(stats) == {"spk00", "spk01", GLOBAL_KEY}

    # numpy oracle: single-utterance extraction, float64 accumulation
    base = cfg._replace(cmvn="none")
    per_utt = {}
    groups = {}
    for u in corpus.utterances:
        f, fl = extract_features(jnp.asarray(u.wav)[None], jnp.asarray([len(u.wav)]), base)
        f = np.asarray(f[0, : int(fl[0])], np.float64)
        per_utt[u.name] = f
        groups.setdefault(u.speaker, []).append(f)
    for spk, fs in groups.items():
        allf = np.concatenate(fs)
        mean, var = allf.mean(0), allf.var(0)
        np.testing.assert_allclose(stats[spk][0], mean, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(stats[spk][1], 1.0 / np.sqrt(var + 1e-8), rtol=1e-3)

    # application inside the task pipeline
    task = CTCTaskConfig(
        model=CTCConfig(encoder=EncoderConfig(num_units=8, num_layers=1),
                        num_classes=4),
        frontend=cfg,
    )
    ds = Dataset(corpus.utterances, batch_size=8, cmvn_stats=stats)
    batch = next(ds.batches(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}
    feats, feat_len = device_pipeline(task, jb)
    feats, feat_len = np.asarray(feats), np.asarray(feat_len)
    by_name = {u.name: u for u in corpus.utterances}
    for i, name in enumerate(batch["names"]):
        if name is None:
            continue
        spk = by_name[name].speaker
        want = (per_utt[name] - stats[spk][0]) * stats[spk][1]
        np.testing.assert_allclose(feats[i, : feat_len[i]], want, rtol=1e-3, atol=1e-3)


def test_fit_with_speaker_cmvn(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    exp = ExperimentConfig(
        corpus="toy", label_type="phone61", toy_num_utts=12, toy_vocab_size=5,
        use_delta=False, use_energy=False, cmvn="speaker",
        num_units=12, num_layers=1, batch_size=6, num_epoch=1,
    )
    s = fit(exp, tmp_path / "m", print_fn=lambda *a: None)
    assert np.isfinite(s["train_loss"])
    assert np.isfinite(s["dev_loss"])


def test_frame_blocks_matches_gather_framing():
    """The reshape-slice framing (TPU gather avoidance) is bit-identical to
    frame_signal on the frame_length columns, across ragged lengths."""
    from tensorflow_end2end_speech_recognition_tpu.frontend.features import (
        _frame_blocks,
        frame_signal,
    )

    cfg = FrontendConfig()
    rng = np.random.RandomState(3)
    for n in (400, 401, 560, 4096, 16000):
        wav = jnp.asarray(rng.randn(2, n).astype(np.float32))
        ref = np.asarray(frame_signal(wav, cfg))
        blk = np.asarray(_frame_blocks(wav, cfg))
        assert blk.shape[:-1] == ref.shape[:-1]
        np.testing.assert_array_equal(blk[..., : cfg.frame_length], ref)
