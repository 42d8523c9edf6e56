"""On-disk .npy corpus loading, real multitask sub labels, crash resume."""

import numpy as np

from tensorflow_end2end_speech_recognition_tpu.data import CharTokenizer, Dataset
from tensorflow_end2end_speech_recognition_tpu.data.npy_corpus import load_npy_split
from tensorflow_end2end_speech_recognition_tpu.train.loop import build_corpus_splits, fit
from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig


def _write_npy_corpus(root, n=6, d=8):
    rng = np.random.RandomState(0)
    for split in ("train", "dev", "test"):
        (root / split / "feats").mkdir(parents=True)
        lines = []
        for i in range(n):
            t = rng.randint(5, 12)
            np.save(root / split / "feats" / f"utt{i}.npy", rng.randn(t, d).astype(np.float32))
            lines.append(f"utt{i}\thello world")
        (root / split / "transcripts.tsv").write_text("\n".join(lines))


def test_npy_corpus_roundtrip(tmp_path):
    _write_npy_corpus(tmp_path)
    tok = CharTokenizer()
    utts = load_npy_split(tmp_path, "train", tok)
    assert len(utts) == 6
    assert utts[0].wav.ndim == 2
    assert tok.decode_text(utts[0].label_ids) == "hello world"
    # flows through Dataset in features mode automatically
    ds = Dataset(utts, batch_size=4)
    batch = next(ds.batches(0))
    assert batch["inputs"].ndim == 3  # [B, T, D]


def test_data_root_via_config(tmp_path):
    _write_npy_corpus(tmp_path)
    exp = ExperimentConfig(corpus="librispeech", label_type="character",
                           data_root=str(tmp_path))
    train, dev, test, tok = build_corpus_splits(exp)
    assert len(train) == len(dev) == len(test) == 6


def _write_learnable_feature_corpus(root, tok, n_train=24, d=16, seed=0, splits=None):
    """Features where label c paints dim c: a CTC model can actually learn it."""
    rng = np.random.RandomState(seed)
    units = tok.units[:6]
    splits = splits or (("train", n_train), ("dev", 8), ("test", 8))
    for split, n in splits:
        (root / split / "feats").mkdir(parents=True)
        lines = []
        for i in range(n):
            ids = rng.randint(0, len(units), size=rng.randint(2, 5))
            frames = []
            for c in ids:
                seg = 0.1 * rng.randn(rng.randint(4, 7), d).astype(np.float32)
                seg[:, c] += 3.0
                frames.append(seg)
            np.save(root / split / "feats" / f"u{i}.npy", np.concatenate(frames))
            lines.append(f"u{i}\t" + "".join(units[c] for c in ids))
        (root / split / "transcripts.tsv").write_text("\n".join(lines))


def test_fit_trains_on_precomputed_features(tmp_path):
    """End-to-end train on the reference's primary input mode: per-utterance
    .npy feature files (frontend bypassed, stack/splice applied to frames).
    Round-1 regression: this path crashed inside the waveform frontend."""
    from tensorflow_end2end_speech_recognition_tpu.data.tokenizers import CharTokenizer

    _write_learnable_feature_corpus(tmp_path, CharTokenizer())
    exp = ExperimentConfig(
        corpus="librispeech", label_type="character", data_root=str(tmp_path),
        num_units=24, num_layers=1, batch_size=8, num_epoch=4,
        num_stack=2, num_skip=2, splice=1, learning_rate=3e-3,
    )
    mdir = tmp_path / "model"
    s = fit(exp, mdir, print_fn=lambda *a: None)
    assert np.isfinite(s["train_loss"]), s
    assert np.isfinite(s["dev_error_rate"]), s
    # the task is learnable: error rate must actually fall below chance
    assert s["best_dev_error_rate"] < 0.9, s
    # and the eval CLI reconstructs the feature-mode task from config.yml
    from tensorflow_end2end_speech_recognition_tpu.bin.eval import main as eval_main

    eval_main([str(mdir)])


def test_multi_eval_set_corpus(tmp_path, capsys):
    """Reference eval-set structure: every non-train split on disk is scored
    and reported per set (LibriSpeech dev_clean/other, test_clean/other)."""
    from tensorflow_end2end_speech_recognition_tpu.bin.eval import main as eval_main
    from tensorflow_end2end_speech_recognition_tpu.data.npy_corpus import (
        available_splits,
        pick_split,
    )
    from tensorflow_end2end_speech_recognition_tpu.data.tokenizers import CharTokenizer

    set_names = ["train960h", "dev_clean", "dev_other", "test_clean", "test_other"]
    _write_learnable_feature_corpus(
        tmp_path, CharTokenizer(),
        splits=[(s, 16 if s.startswith("train") else 4) for s in set_names],
    )
    assert available_splits(tmp_path) == sorted(set_names)
    assert pick_split(sorted(set_names), "dev") == "dev_clean"
    exp = ExperimentConfig(
        corpus="librispeech", label_type="character", data_root=str(tmp_path),
        train_data_size="train960h",
        num_units=16, num_layers=1, batch_size=8, num_epoch=1,
    )
    mdir = tmp_path / "model"
    fit(exp, mdir, print_fn=lambda *a: None)
    capsys.readouterr()
    eval_main([str(mdir)])
    out = capsys.readouterr().out
    for s in ("dev_clean", "dev_other", "test_clean", "test_other"):
        assert f"{s} (epoch" in out, out
    assert "train960h (epoch" not in out


def test_multitask_sub_labels(tmp_path):
    exp = ExperimentConfig(
        model_type="multitask_ctc", encoder_type="multitask_blstm",
        corpus="toy", label_type="phone61", label_type_sub="character",
        toy_num_utts=12, toy_vocab_size=5, use_delta=False, use_energy=False,
        num_units=12, num_layers=2, num_layers_sub=1, batch_size=6, num_epoch=1,
    )
    train, dev, test, tok = build_corpus_splits(exp)
    assert train[0].sub_ids is not None
    assert tok.sub_tokenizer.num_units == 28  # characters
    s = fit(exp, tmp_path / "mt", print_fn=lambda *a: None)
    assert np.isfinite(s["train_loss"])


def test_resume_is_bit_exact(tmp_path):
    """Full-state checkpointing: a killed-and-resumed run must produce
    bit-identical params to an uninterrupted run (optimizer moments, RNG
    stream, LR-controller state all restored — tf.train.Saver semantics)."""
    import jax

    from tensorflow_end2end_speech_recognition_tpu.train.checkpoint import CheckpointManager
    from tensorflow_end2end_speech_recognition_tpu.train.loop import build_task

    base = dict(
        corpus="toy", label_type="phone61", toy_num_utts=12, toy_vocab_size=5,
        use_delta=False, use_energy=False, num_units=12, num_layers=1,
        batch_size=6, decay_start_epoch=0, decay_patient_epoch=0,
    )
    exp3 = ExperimentConfig(**base, num_epoch=3)
    fit(exp3, tmp_path / "full", print_fn=lambda *a: None)

    exp2 = ExperimentConfig(**base, num_epoch=2)
    fit(exp2, tmp_path / "split", print_fn=lambda *a: None)
    logs = []
    s = fit(exp3, tmp_path / "split", print_fn=logs.append)
    assert any("resuming from checkpoint epoch 1" in str(l) for l in logs), logs
    assert s["epochs"] == 3

    _, _, _, tok = build_corpus_splits(exp3)
    task, task_mod = build_task(exp3, tok)
    like = task_mod.init_params(jax.random.PRNGKey(exp3.seed), task)
    params = {}
    for name in ("full", "split"):
        _, st = CheckpointManager(tmp_path / name / "checkpoints").restore(
            {"params": like}, epoch=2
        )
        params[name] = jax.tree.map(np.asarray, st["params"])
    jax.tree.map(np.testing.assert_array_equal, params["full"], params["split"])


def test_fit_resumes_from_checkpoint(tmp_path):
    exp = ExperimentConfig(
        corpus="toy", label_type="phone61", toy_num_utts=12, toy_vocab_size=5,
        use_delta=False, use_energy=False, num_units=12, num_layers=1,
        batch_size=6, num_epoch=2,
    )
    mdir = tmp_path / "m"
    fit(exp, mdir, print_fn=lambda *a: None)
    # restart with more epochs: must resume at epoch 2, not 0
    logs = []
    exp2 = ExperimentConfig(**{**exp.__dict__, "num_epoch": 3})
    s = fit(exp2, mdir, print_fn=logs.append)
    assert any("resuming from checkpoint epoch 1" in str(l) for l in logs), logs
    assert s["epochs"] == 3
