"""Visualization entry point: training curves, CTC posterior spikes,
attention heatmaps from a trained model dir.

Reference parity: ``experiments/<corpus>/visualization/{plot_ctc_probs,
plot_attention_weights}.py`` (SURVEY.md §2.7).

    python -m tensorflow_end2end_speech_recognition_tpu.bin.plot \
        /tmp/model_dir [--utt-index 0]
"""

from __future__ import annotations

import argparse

from ..utils.jax_setup import setup as _jax_setup
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Dataset
from ..models.ctc import apply_ctc
from ..models.seq2seq import greedy_decode
from ..ops.ctc import ctc_posteriors
from ..train.checkpoint import CheckpointManager
from ..train.ctc_task import device_pipeline
from ..train.loop import build_corpus_splits, build_task, cmvn_stats_for, feature_dim_of
from ..utils.config import ExperimentConfig
from ..utils.plot import plot_attention_weights, plot_ctc_posteriors, plot_training_curves


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--utt-index", type=int, default=0)
    args = ap.parse_args(argv)
    _jax_setup()

    model_dir = Path(args.model_dir)
    exp = ExperimentConfig.from_yaml(model_dir / "config.yml")
    made = [str(p) for p in plot_training_curves(model_dir)]

    _, dev_utts, _, tokenizer = build_corpus_splits(exp, need=("dev",))
    task, task_mod = build_task(exp, tokenizer, feature_dim_of(dev_utts))
    params = task_mod.init_params(jax.random.PRNGKey(exp.seed), task)
    epoch, state = CheckpointManager(model_dir / "checkpoints").restore(
        {"params": params}, args.epoch
    )
    params = state["params"]
    ds = Dataset(dev_utts, min(8, len(dev_utts)),
                 cmvn_stats=cmvn_stats_for(exp, task, dev_utts))
    batch = next(ds.batches(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}
    i = args.utt_index
    n_rows = sum(1 for n in batch["names"] if n is not None)
    if not 0 <= i < n_rows:
        # JAX indexing clamps out-of-bounds silently — that would plot the
        # wrong utterance under the requested index's filename
        raise SystemExit(f"--utt-index {i} out of range (batch has {n_rows} utts)")

    if exp.model_type in ("ctc", "multitask_ctc"):
        @jax.jit
        def run(params, b):
            feats, fl = device_pipeline(task, b)
            out = apply_ctc(params, task.model, feats, fl)
            return ctc_posteriors(out.logits), out.logit_len

        post, plen = run(params, jb)
        p = np.asarray(post[i][: int(plen[i])])
        made.append(str(plot_ctc_posteriors(
            p, model_dir / f"ctc_probs_utt{i}.png",
            blank_id=task.model.blank_id, unit_names=tokenizer.units,
        )))
    else:
        @jax.jit
        def run(params, b):
            feats, fl = device_pipeline(task, b)
            return greedy_decode(params, task.model, feats, fl)

        out = run(params, jb)
        hyp = tokenizer.decode(np.asarray(out.predicted_ids[i]))
        made.append(str(plot_attention_weights(
            np.asarray(out.attention_weights[i][: max(len(hyp), 1)]),
            model_dir / f"attention_weights_utt{i}.png",
            hyp_tokens=hyp or None,
        )))
    print("wrote:", *made, sep="\n  ")


if __name__ == "__main__":
    main()
