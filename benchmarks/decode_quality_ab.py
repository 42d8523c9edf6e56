"""Decode-stack quality A/B on saved checkpoints (VERDICT r4 #5).

The reference's eval story is beam search (``tf.nn.ctc_beam_search_decoder``,
SURVEY.md §2.8) and the literature story is beam + LM fusion + joint
rescoring; round 1 demonstrated beam > greedy only on the now-saturated easy
toy. This script re-demonstrates (or refutes) each decode-stack stage on the
hard corpus, holding the checkpoint fixed:

  greedy                       beam_width=1
  beam                         config/CLI beam width, no LM
  beam+lm                      + RNN-LM shallow fusion (--lm-dir)
  beam-norescore (joint only)  attention beam WITHOUT the joint CTC
                               re-ranking, isolating the rescoring delta

Usage:
  python benchmarks/decode_quality_ab.py MODEL_DIR [MODEL_DIR ...] \
      [--beam 20] [--lm-dir DIR] [--lm-weight 0.3] [--sets dev test]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup  # noqa: E402


def eval_variant(eval_step, params, utts, exp, task, tokenizer):
    from tensorflow_end2end_speech_recognition_tpu.data import Dataset
    from tensorflow_end2end_speech_recognition_tpu.train.loop import cmvn_stats_for
    from tensorflow_end2end_speech_recognition_tpu.utils.metrics import evaluate_ctc

    ds = Dataset(utts, exp.eval_batch_size or exp.batch_size,
                 cmvn_stats=cmvn_stats_for(exp, task, utts))
    m = evaluate_ctc(eval_step, params, ds, tokenizer, exp.label_type)
    out = {"err": round(float(m["error_rate"]), 4)}
    if "wer" in m:
        out["wer"] = round(float(m["wer"]), 4)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dirs", nargs="+")
    ap.add_argument("--beam", type=int, default=None,
                    help="beam width (default: config beam_width, min 2)")
    ap.add_argument("--lm-dir", default=None)
    ap.add_argument("--lm-weight", type=float, default=0.3)
    ap.add_argument("--sets", nargs="*", default=["dev", "test"])
    args = ap.parse_args()
    setup()

    import jax

    from tensorflow_end2end_speech_recognition_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
        build_task,
        feature_dim_of,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    lm = None
    if args.lm_dir:
        from tensorflow_end2end_speech_recognition_tpu.bin.train_lm import load_lm

        lm = load_lm(args.lm_dir)

    for mdir in map(Path, args.model_dirs):
        exp = ExperimentConfig.from_yaml(mdir / "config.yml")
        _, dev_utts, test_utts, tokenizer = build_corpus_splits(exp)
        task, task_mod = build_task(exp, tokenizer, feature_dim_of(dev_utts))
        params = task_mod.init_params(jax.random.PRNGKey(exp.seed), task)
        epoch, state = CheckpointManager(mdir / "checkpoints").restore(
            {"params": params}
        )
        params = state["params"]
        beam = args.beam or max(exp.beam_width, 2)
        is_att = exp.model_type in ("attention", "joint_ctc_attention")
        is_joint = exp.model_type == "joint_ctc_attention"

        variants: list[tuple[str, object]] = [
            ("greedy", task_mod.make_eval_step(task))
        ]
        if is_att:
            rescore_w = exp.ctc_loss_weight if is_joint else None
            if is_joint:
                variants.append(("beam-norescore", task_mod.make_beam_eval_step(
                    task, beam, exp.length_penalty, joint_rescore_weight=None)))
            variants.append(("beam", task_mod.make_beam_eval_step(
                task, beam, exp.length_penalty, joint_rescore_weight=rescore_w)))
            if lm is not None:
                variants.append(("beam+lm", task_mod.make_beam_eval_step(
                    task, beam, exp.length_penalty, joint_rescore_weight=rescore_w,
                    lm=lm, lm_weight=args.lm_weight)))
        else:
            variants.append(("beam", task_mod.make_beam_eval_step(task, beam)))
            if lm is not None:
                variants.append(("beam+lm", task_mod.make_beam_eval_step(
                    task, beam, lm=lm, lm_weight=args.lm_weight)))

        sets = {"dev": dev_utts, "test": test_utts}
        for vname, step in variants:
            row = {"model_dir": str(mdir),
                   "model": f"{exp.model_type}/{exp.encoder_type}",
                   "epoch": int(epoch), "variant": vname,
                   "beam": 1 if vname == "greedy" else beam}
            if "lm" in vname:
                row["lm_weight"] = args.lm_weight
            for s in args.sets:
                row[s] = eval_variant(step, params, sets[s], exp, task, tokenizer)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
