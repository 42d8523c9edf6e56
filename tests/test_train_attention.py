"""Attention + joint training through fit(): convergence smoke on the toy task."""


import numpy as np

from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig


def _base(**kw):
    kw.setdefault("encoder_type", "pyramidal_blstm")
    return ExperimentConfig(
        corpus="toy",
        label_type="phone61",
        toy_num_utts=24,
        toy_vocab_size=6,
        use_delta=False,
        use_energy=False,
        num_units=24,
        num_layers=2,
        attention_dim=16,
        attention_conv_width=11,
        attention_conv_num_channels=4,
        decoder_num_units=24,
        embedding_dim=12,
        max_decode_length=12,
        batch_size=12,
        num_epoch=8,
        learning_rate=3e-3,
        sort_stop_epoch=100,
        **kw,
    )


def _loss_curve(model_dir, col="train_loss"):
    import csv

    with open(model_dir / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    return [float(r[col]) for r in rows]


def test_attention_fit_learns(tmp_path):
    exp = _base(model_type="attention")
    s = fit(exp, tmp_path / "att", log_every=1000, print_fn=lambda *a: None)
    assert np.isfinite(s["train_loss"])
    curve = _loss_curve(tmp_path / "att")
    # too few steps for alignment to emerge; loss must still be dropping
    assert curve[-1] < 0.8 * curve[0], curve
    assert (tmp_path / "att" / "config.yml").exists()
    # dev loss is a real teacher-forced NLL (round-1 bug: reported zeros)
    dev_curve = _loss_curve(tmp_path / "att", "dev_loss")
    assert all(np.isfinite(v) and v > 0 for v in dev_curve), dev_curve
    assert dev_curve[-1] < 0.8 * dev_curve[0], dev_curve
    assert np.isfinite(s["dev_loss"]) and s["dev_loss"] > 0


def test_joint_fit_learns(tmp_path):
    exp = _base(model_type="joint_ctc_attention", ctc_loss_weight=0.3)
    s = fit(exp, tmp_path / "joint", log_every=1000, print_fn=lambda *a: None)
    assert np.isfinite(s["train_loss"])
    curve = _loss_curve(tmp_path / "joint")
    assert curve[-1] < 0.8 * curve[0], curve


def test_multitask_ctc_fit(tmp_path):
    exp = _base(
        model_type="multitask_ctc", encoder_type="multitask_blstm",
        num_layers_sub=1, main_task_weight=0.7,
    )
    s = fit(exp, tmp_path / "mt", log_every=1000, print_fn=lambda *a: None)
    assert np.isfinite(s["train_loss"])
