"""Per-config measurement sweep: train -> beam eval -> decode RTF, one row each.

Runs every YAML under configs/ end-to-end on the toy corpus (no real corpora
ship with this environment) and prints a markdown table row per config:
utterances/sec/chip, final train loss, best dev error, beam-eval dev/test
error, decode RTF, and the current commit. Appended to BASELINE.md each
round so quality/perf regressions are visible per config (SURVEY.md §6
measurement plan).

Usage:  python benchmarks/config_sweep.py [--utts 512] [--epochs 12]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # runnable from anywhere

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup  # noqa: E402


def measure_rtf(exp, task, task_mod, params, utts, tokenizer):
    """Batched end-to-end decode (features -> text) real-time factor."""
    import jax.numpy as jnp

    from tensorflow_end2end_speech_recognition_tpu.data import Dataset
    from tensorflow_end2end_speech_recognition_tpu.train.loop import cmvn_stats_for

    ds = Dataset(utts, min(32, len(utts)), cmvn_stats=cmvn_stats_for(exp, task, utts))
    batch = next(ds.batches(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}
    beam = max(exp.beam_width, 1)
    step = (
        task_mod.make_beam_eval_step(task, beam)
        if beam > 1
        else task_mod.make_eval_step(task)
    )
    decoded, dec_len, _ = step(params, jb)
    float(jnp.sum(dec_len))  # sync (block_until_ready lies on this backend)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        decoded, dec_len, _ = step(params, jb)
    float(jnp.sum(dec_len))
    dt = (time.perf_counter() - t0) / n
    if batch["inputs"].ndim == 2:  # waveforms
        audio_s = float(batch["input_len"].sum()) / 16000.0
    else:  # precomputed features, 10 ms hop
        audio_s = float(batch["input_len"].sum()) * 0.010
    return dt / max(audio_s, 1e-9)


def run_config(cfg_path: Path, utts: int, epochs: int, out_root: Path,
               profile: str | None = None):
    import jax
    import numpy as np

    from tensorflow_end2end_speech_recognition_tpu.data import Dataset
    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
        build_task,
        cmvn_stats_for,
        feature_dim_of,
        fit,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.checkpoint import CheckpointManager
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig
    from tensorflow_end2end_speech_recognition_tpu.utils.metrics import evaluate_ctc

    exp = ExperimentConfig.from_yaml(cfg_path)
    exp = dataclasses.replace(exp, num_epoch=epochs, toy_num_utts=utts)
    if profile:  # --profile hard: the discriminative benchmark corpus
        exp = dataclasses.replace(exp, toy_profile=profile)
    mdir = out_root / cfg_path.stem
    if mdir.exists():  # fresh measurement: never resume a previous sweep's run
        import shutil

        shutil.rmtree(mdir)
    summary = fit(exp, mdir, print_fn=lambda *a: None)

    _, dev_utts, test_utts, tokenizer = build_corpus_splits(exp)
    task, task_mod = build_task(exp, tokenizer, feature_dim_of(dev_utts))
    params = task_mod.init_params(jax.random.PRNGKey(exp.seed), task)
    _, state = CheckpointManager(mdir / "checkpoints").restore({"params": params})
    params = state["params"]

    beam = max(exp.beam_width, 1)
    if beam > 1:
        if exp.model_type in ("attention", "joint_ctc_attention"):
            eval_step = task_mod.make_beam_eval_step(
                task, beam, exp.length_penalty,
                joint_rescore_weight=exp.ctc_loss_weight
                if exp.model_type == "joint_ctc_attention" else None,
            )
        else:
            eval_step = task_mod.make_beam_eval_step(task, beam)
    else:
        eval_step = task_mod.make_eval_step(task)
    errs, wers = {}, {}
    for name, u in (("dev", dev_utts), ("test", test_utts)):
        ds = Dataset(u, exp.eval_batch_size or exp.batch_size,
                     cmvn_stats=cmvn_stats_for(exp, task, u))
        m = evaluate_ctc(eval_step, params, ds, tokenizer, exp.label_type)
        errs[name] = m["error_rate"]
        if "wer" in m:
            wers[name] = m["wer"]
    rtf = measure_rtf(exp, task, task_mod, params, test_utts, tokenizer)
    row = {
        "config": cfg_path.name,
        "model": f"{exp.model_type}/{exp.encoder_type}",
        "utts_per_sec": round(summary["utts_per_sec"], 1),
        "train_loss": round(summary["train_loss"], 3),
        "best_dev_err": round(summary["best_dev_error_rate"], 4),
        "beam": beam,
        "dev_err": round(float(errs["dev"]), 4),
        "test_err": round(float(errs["test"]), 4),
        "decode_rtf": f"{rtf:.2e}",
    }
    if wers:  # word-level readout for character models
        row["test_wer"] = round(float(wers["test"]), 4)
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--utts", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--out", default="/tmp/config_sweep")
    ap.add_argument("--configs", nargs="*", default=None)
    ap.add_argument("--profile", default=None, choices=["easy", "hard", "harder"],
                    help="override every config's toy_profile")
    args = ap.parse_args()
    setup()

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    cfgs = (
        [Path(c) for c in args.configs]
        if args.configs
        else sorted((REPO / "configs").glob("*.yml"))
    )
    rows = []
    for cfg in cfgs:
        t0 = time.perf_counter()
        row = run_config(cfg, args.utts, args.epochs, Path(args.out),
                         profile=args.profile)
        row["wall_min"] = round((time.perf_counter() - t0) / 60, 1)
        row["commit"] = commit
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| config | model | train utts/s | best dev err | beam | dev err | test err | decode RTF | commit |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['config']} | {r['model']} | {r['utts_per_sec']} | {r['best_dev_err']} "
            f"| {r['beam']} | {r['dev_err']} | {r['test_err']} | {r['decode_rtf']} | {r['commit']} |"
        )


if __name__ == "__main__":
    main()
