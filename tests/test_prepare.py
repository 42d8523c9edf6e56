"""Offline corpus preparation CLI: wav -> .npy layout -> trainable."""

import wave

import numpy as np
import pytest

from tensorflow_end2end_speech_recognition_tpu.bin import prepare
from tensorflow_end2end_speech_recognition_tpu.data.toy_corpus import ToyCorpus


def _write_wav(path, wav, rate=16000):
    pcm = np.clip(wav * 0.5, -1, 1)  # headroom so int16 doesn't clip
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((pcm * 32767).astype(np.int16).tobytes())


def _make_corpus(tmp_path, n=10, seed=0):
    corpus = ToyCorpus(label_type="phone61", num_utts=n, seed=seed, vocab_size=6)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir(exist_ok=True)
    lines = []
    for u in corpus.utterances:
        _write_wav(wav_dir / f"{u.name}.wav", u.wav)
        lines.append(f"{u.name}\t{wav_dir / (u.name + '.wav')}\t{u.speaker}\t{u.text}")
    scp = tmp_path / "scp.tsv"
    scp.write_text("\n".join(lines) + "\n")
    return corpus, scp


def test_prepare_layout_and_cmvn_oracle(tmp_path, capsys):
    corpus, scp = _make_corpus(tmp_path)
    prepare.main([str(tmp_path / "root"), "train", "--wav-scp", str(scp),
                  "--no-delta", "--no-energy", "--cmvn", "utterance"])
    out = capsys.readouterr().out
    assert "prepared 10 utterances" in out

    root = tmp_path / "root" / "train"
    tsv = root / "transcripts.tsv"
    assert tsv.exists()
    first = corpus.utterances[0]
    f = np.load(root / "feats" / f"{first.name}.npy")
    assert f.ndim == 2 and f.shape[1] == 40 and f.dtype == np.float32
    # per-utterance CMVN oracle: zero mean / unit variance over frames
    np.testing.assert_allclose(f.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(f.std(axis=0), 1.0, atol=1e-3)
    # 3-column speaker layout preserved
    assert tsv.read_text().splitlines()[0].split("\t")[1] == first.speaker


def test_prepare_speaker_cmvn_groups(tmp_path):
    corpus, scp = _make_corpus(tmp_path, n=8, seed=1)
    prepare.main([str(tmp_path / "root"), "train", "--wav-scp", str(scp),
                  "--no-delta", "--no-energy", "--cmvn", "speaker"])
    root = tmp_path / "root" / "train"
    by_spk = {}
    for u in corpus.utterances:
        by_spk.setdefault(u.speaker, []).append(
            np.load(root / "feats" / f"{u.name}.npy")
        )
    for spk, mats in by_spk.items():
        cat = np.concatenate(mats, axis=0)
        np.testing.assert_allclose(cat.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(cat.std(axis=0), 1.0, atol=1e-3)


def test_prepared_corpus_trains_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    _, scp = _make_corpus(tmp_path, n=12, seed=2)
    for split in ("train", "dev", "test"):
        prepare.main([str(tmp_path / "root"), split, "--wav-scp", str(scp),
                      "--no-delta", "--no-energy"])
    exp = ExperimentConfig(
        model_type="ctc", corpus="timit", label_type="phone61",
        data_root=str(tmp_path / "root"), use_delta=False, use_energy=False,
        num_units=12, num_layers=1, batch_size=6, num_epoch=1, beam_width=1,
    )
    s = fit(exp, tmp_path / "model", print_fn=lambda *a: None)
    assert np.isfinite(s["train_loss"])


def test_prepare_rejects_bad_inputs(tmp_path):
    scp = tmp_path / "bad.tsv"
    scp.write_text("utt1\tonly_two_cols\n")
    with pytest.raises(ValueError, match="scp line"):
        prepare.parse_scp(scp)

    wav = tmp_path / "w.wav"
    _write_wav(wav, np.zeros(1600, np.float32), rate=8000)
    with pytest.raises(ValueError, match="sample rate"):
        prepare.read_wav(wav, 16000)
