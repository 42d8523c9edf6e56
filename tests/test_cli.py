"""In-process CLI smoke tests: train -> eval -> decode -> plot on CPU.

Drives the argparse mains exactly as a user would (module entry points),
on a tiny toy config, covering the CLI glue that unit tests skip.
"""

import numpy as np
import yaml


def _write_cfg(path):
    cfg = dict(
        model_type="ctc", corpus="toy", label_type="phone61",
        toy_num_utts=12, toy_vocab_size=5, use_delta=False, use_energy=False,
        num_units=12, num_layers=1, batch_size=6, num_epoch=1, beam_width=2,
    )
    path.write_text(yaml.safe_dump(cfg))


def test_cli_train_eval_decode_plot(tmp_path, capsys):
    from tensorflow_end2end_speech_recognition_tpu.bin import decode, eval as eval_bin, plot, train

    cfg = tmp_path / "cfg.yml"
    _write_cfg(cfg)
    mdir = tmp_path / "model"

    train.main([str(cfg), str(mdir)])
    out = capsys.readouterr().out
    assert "FINAL" in out and (mdir / "config.yml").exists()
    assert (mdir / "metrics.csv").exists() and (mdir / "train.log").exists()
    assert (mdir / "loss.png").exists()

    eval_bin.main([str(mdir)])
    out = capsys.readouterr().out
    assert "dev (epoch" in out and "test (epoch" in out and "S " in out

    decode.main([str(mdir), "--beam-width", "2", "--num-utts", "2",
                 "--nbest", "2"])
    out = capsys.readouterr().out
    assert "REF:" in out and "HYP:" in out
    assert "HYP2 (score " in out  # n-best printing of the full beam

    plot.main([str(mdir)])
    out = capsys.readouterr().out
    assert "ctc_probs_utt0.png" in out


def test_cli_train_lm_and_lm_fused_eval(tmp_path, capsys):
    from tensorflow_end2end_speech_recognition_tpu.bin import eval as eval_bin
    from tensorflow_end2end_speech_recognition_tpu.bin import train, train_lm

    cfg = tmp_path / "cfg.yml"
    _write_cfg(cfg)
    train_lm.main([str(cfg), str(tmp_path / "lm"), "--epochs", "1",
                   "--num-units", "8", "--embedding-dim", "4"])
    out = capsys.readouterr().out
    assert "FINAL dev_ppl" in out
    params, lm_cfg = train_lm.load_lm(tmp_path / "lm")
    assert lm_cfg.vocab == 63  # 61 phones + sos + eos

    # eval with carried-state LM fusion in the CTC prefix beam
    mdir = tmp_path / "model"
    train.main([str(cfg), str(mdir)])
    capsys.readouterr()
    eval_bin.main([str(mdir), "--beam-width", "3",
                   "--lm-dir", str(tmp_path / "lm"), "--lm-weight", "0.2"])
    out = capsys.readouterr().out
    assert "LM fusion w=0.2" in out
    assert "dev (epoch" in out and "test (epoch" in out


def test_cli_eval_greedy_with_lm_warns_not_crashes(tmp_path, capsys):
    """--lm-dir with greedy decoding must warn and proceed (round-2 advisor
    finding: eval_step was unassigned on this path)."""
    from tensorflow_end2end_speech_recognition_tpu.bin import eval as eval_bin
    from tensorflow_end2end_speech_recognition_tpu.bin import train, train_lm

    cfg = tmp_path / "cfg.yml"
    _write_cfg(cfg)
    train_lm.main([str(cfg), str(tmp_path / "lm"), "--epochs", "1",
                   "--num-units", "8", "--embedding-dim", "4"])
    train.main([str(cfg), str(tmp_path / "model")])
    capsys.readouterr()
    eval_bin.main([str(tmp_path / "model"), "--beam-width", "1",
                   "--lm-dir", str(tmp_path / "lm")])
    out = capsys.readouterr().out
    assert "ignored for greedy" in out
    assert "dev (epoch" in out


def test_cli_decode_applies_speaker_cmvn(tmp_path, capsys):
    """decode/eval on a cmvn:speaker model must feed speaker-normalized
    features (round-2 advisor finding: decode fed raw features)."""
    import yaml as _yaml

    from tensorflow_end2end_speech_recognition_tpu.bin import decode, train

    cfg = tmp_path / "cfg.yml"
    raw = dict(
        model_type="ctc", corpus="toy", label_type="phone61",
        toy_num_utts=12, toy_vocab_size=5, use_delta=False, use_energy=False,
        cmvn="speaker",
        num_units=12, num_layers=1, batch_size=6, num_epoch=1,
    )
    cfg.write_text(_yaml.safe_dump(raw))
    mdir = tmp_path / "model"
    train.main([str(cfg), str(mdir)])
    capsys.readouterr()

    # the decode CLI must build its Dataset with speaker stats attached
    from tensorflow_end2end_speech_recognition_tpu.data import dataset as ds_mod

    seen = {}
    orig = ds_mod.Dataset.__init__

    def spy(self, *a, **kw):
        seen["cmvn_stats"] = kw.get("cmvn_stats")
        return orig(self, *a, **kw)

    ds_mod.Dataset.__init__ = spy
    try:
        decode.main([str(mdir), "--num-utts", "2"])
    finally:
        ds_mod.Dataset.__init__ = orig
    assert seen["cmvn_stats"] is not None
    out = capsys.readouterr().out
    assert "REF:" in out


def test_cli_export_selfcheck(tmp_path, capsys):
    from tensorflow_end2end_speech_recognition_tpu.bin import export as export_bin, train

    cfg = tmp_path / "cfg.yml"
    _write_cfg(cfg)
    mdir = tmp_path / "model"
    train.main([str(cfg), str(mdir)])
    capsys.readouterr()

    out_path = tmp_path / "model.shlo"
    export_bin.main([str(mdir), str(out_path), "--batch", "2",
                     "--seconds", "0.5", "--beam-width", "2", "--selfcheck"])
    out = capsys.readouterr().out
    assert "exported" in out and "selfcheck ok" in out
    assert out_path.exists() and out_path.with_suffix(".shlo.json").exists()


def test_cli_export_streaming(tmp_path, capsys):
    import yaml

    from tensorflow_end2end_speech_recognition_tpu.bin import export as export_bin, train

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(yaml.safe_dump(dict(
        model_type="ctc", corpus="toy", label_type="phone61",
        toy_num_utts=12, toy_vocab_size=5, use_delta=False, use_energy=False,
        cmvn="none", encoder_type="lstm",
        num_units=12, num_layers=1, batch_size=6, num_epoch=1, beam_width=1,
    )))
    mdir = tmp_path / "model"
    train.main([str(cfg), str(mdir)])
    capsys.readouterr()

    out_path = tmp_path / "stream.shlo"
    export_bin.main([str(mdir), str(out_path), "--batch", "2",
                     "--streaming", "--chunk-ms", "200", "--selfcheck"])
    out = capsys.readouterr().out
    assert "exported" in out and "streaming" in out and "selfcheck ok" in out
    assert out_path.exists() and out_path.with_suffix(".shlo.json").exists()


def test_config_warns_on_ignored_reference_keys():
    """Reference keys that are accepted but dropped (dropout_input,
    pretrain_stage) must warn, not vanish silently (VERDICT r2 #10)."""
    import warnings

    import pytest

    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    with pytest.warns(UserWarning, match="dropout_input"):
        ExperimentConfig.from_dict({"dropout_input": 0.8})
    with pytest.warns(UserWarning, match="pretrain_stage"):
        ExperimentConfig.from_dict({"pretrain_stage": 1})
    # aliased keys that DO take effect stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cfg = ExperimentConfig.from_dict({"dropout_encoder": 0.7})
    assert cfg.dropout == 0.7
    with pytest.raises(KeyError):
        ExperimentConfig.from_dict({"not_a_key": 1})


def test_cli_transducer_train_eval_decode_export(tmp_path, capsys):
    """model_type: transducer through every CLI: train, greedy+beam eval,
    decode, batch export, streaming export."""
    from tensorflow_end2end_speech_recognition_tpu.bin import (
        decode,
        eval as eval_bin,
        export,
        train,
    )

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(yaml.safe_dump(dict(
        model_type="transducer", corpus="toy", label_type="phone61",
        toy_num_utts=12, toy_vocab_size=5, use_delta=False, use_energy=False,
        cmvn="none", encoder_type="lstm",
        num_units=12, num_layers=1, pred_num_units=12, joint_dim=12,
        embedding_dim=6, max_symbols_per_frame=2,
        batch_size=6, num_epoch=1, beam_width=1,
    )))
    mdir = tmp_path / "model"

    train.main([str(cfg), str(mdir)])
    out = capsys.readouterr().out
    assert "FINAL" in out and "transducer" in out

    eval_bin.main([str(mdir)])
    out = capsys.readouterr().out
    assert "dev (epoch" in out and "test (epoch" in out

    eval_bin.main([str(mdir), "--beam-width", "2"])
    out = capsys.readouterr().out
    assert "beam width 2" in out and "dev (epoch" in out

    decode.main([str(mdir), "--beam-width", "2", "--num-utts", "2"])
    out = capsys.readouterr().out
    assert "REF:" in out and "HYP:" in out

    export.main([str(mdir), str(tmp_path / "t.shlo"), "--batch", "2",
                 "--seconds", "0.5", "--selfcheck"])
    out = capsys.readouterr().out
    assert "exported" in out and "selfcheck ok" in out

    export.main([str(mdir), str(tmp_path / "ts.shlo"), "--batch", "2",
                 "--streaming", "--chunk-ms", "200", "--selfcheck"])
    out = capsys.readouterr().out
    assert "streaming" in out and "selfcheck ok" in out
