"""Export a trained model as a frozen StableHLO inference artifact.

Serving-deployment entry point (no reference counterpart — the reference
decoded inside research scripts; SURVEY.md §1 notes it has no serving
layer). The artifact bakes in the checkpoint weights and the full
inference pipeline (frontend -> encoder -> decode) for fixed batch shapes;
``serving.load_exported`` (or any StableHLO runtime) runs it without model
code or checkpoints.

    python -m tensorflow_end2end_speech_recognition_tpu.bin.export \
        /tmp/model_dir /tmp/model.shlo [--batch 8] [--seconds 12] \
        [--beam-width 20] [--epoch N] [--platforms tpu cpu]
"""

from __future__ import annotations

import argparse

from ..utils.jax_setup import setup as _jax_setup
from pathlib import Path

import jax
import numpy as np

from ..serving import export_model, load_exported
from ..train.checkpoint import CheckpointManager
from ..train.loop import build_corpus_splits, build_task, feature_dim_of
from ..utils.config import ExperimentConfig


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("out_path")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=12.0,
                    help="padded audio seconds (frontend mode) per utterance")
    ap.add_argument("--frames", type=int, default=None,
                    help="padded frames (precomputed-feature mode)")
    ap.add_argument("--beam-width", type=int, default=1)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--platforms", nargs="*", default=None)
    ap.add_argument("--lm-dir", default=None,
                    help="RNN-LM dir from bin.train_lm: bake shallow fusion "
                         "into the beam-decode graph (batch AND --streaming "
                         "artifacts; needs --beam-width > 1)")
    ap.add_argument("--lm-weight", type=float, default=0.3)
    ap.add_argument("--streaming", action="store_true",
                    help="export the chunked streaming step instead of the "
                         "batch pipeline (causal configs only; streaming.py)")
    ap.add_argument("--chunk-ms", type=float, default=100.0,
                    help="streaming chunk duration")
    ap.add_argument("--selfcheck", action="store_true",
                    help="reload the artifact and run it on zeros")
    args = ap.parse_args(argv)
    _jax_setup()

    model_dir = Path(args.model_dir)
    exp = ExperimentConfig.from_yaml(model_dir / "config.yml")
    _, dev_utts, _, tokenizer = build_corpus_splits(exp, need=("dev",))
    task, task_mod = build_task(exp, tokenizer, feature_dim_of(dev_utts))
    params = task_mod.init_params(jax.random.PRNGKey(exp.seed), task)
    epoch, state = CheckpointManager(model_dir / "checkpoints").restore(
        {"params": params}, args.epoch
    )
    params = state["params"]

    lm = None
    if args.lm_dir:
        from .train_lm import load_lm

        lm = load_lm(args.lm_dir)

    if args.streaming:
        from ..serving import export_streaming_model, load_streaming

        if task.frontend is None:
            raise SystemExit(
                "--streaming needs the waveform frontend; this model was "
                "trained on precomputed features (data_root mode)"
            )
        hop = task.frontend.frame_step
        chunk = max(hop, int(args.chunk_ms / 1000.0 * task.frontend.sample_rate))
        chunk -= chunk % hop  # must be hop-aligned
        out = export_streaming_model(
            task, params, args.out_path, args.batch, chunk, tokenizer=tokenizer,
            platforms=tuple(args.platforms) if args.platforms else None,
            extra_meta={"label_type": exp.label_type,
                        "sample_rate": task.frontend.sample_rate,
                        "lm_weight": args.lm_weight if lm else 0.0},
            beam_width=args.beam_width,
            lm=lm, lm_weight=args.lm_weight,
        )
        print(f"exported epoch-{epoch} streaming {exp.model_type}/"
              f"{exp.encoder_type} chunk {chunk} samples beam "
              f"{args.beam_width} -> {out} ({out.stat().st_size / 1e6:.1f} MB)")
        if args.selfcheck:
            state, step, finalize = load_streaming(out)
            zeros = np.zeros((args.batch, chunk), np.float32)
            lens = np.full((args.batch,), chunk, np.int32)
            state, tokens, n = step(state, zeros, lens)
            state, tokens, n = step(state, zeros, lens)
            msg = (f"selfcheck ok: tokens {np.asarray(tokens).shape}, "
                   f"counts {np.asarray(n).tolist()}")
            if finalize is not None:
                pref, flen, _ = finalize(state)
                msg += f", beam final {np.asarray(pref).shape}"
            print(msg)
        return

    if task.frontend is not None:
        num = int(args.seconds * task.frontend.sample_rate)
    else:
        num = args.frames or 1200
    out = export_model(
        task, task_mod, params, args.out_path, args.batch, num,
        beam_width=args.beam_width, tokenizer=tokenizer,
        platforms=tuple(args.platforms) if args.platforms else None,
        extra_meta={"label_type": exp.label_type, "model_type": exp.model_type,
                    "sample_rate": task.frontend.sample_rate
                    if task.frontend is not None else None},
        lm=lm, lm_weight=args.lm_weight,
    )
    size = out.stat().st_size
    print(f"exported epoch-{epoch} {exp.model_type}/{exp.encoder_type} "
          f"beam {args.beam_width} -> {out} ({size / 1e6:.1f} MB)")
    if args.selfcheck:
        infer = load_exported(out)
        inputs = np.zeros((args.batch, num) if task.frontend is not None
                          else (args.batch, num, task.feature_dim), np.float32)
        lens = np.full((args.batch,), num, np.int32)
        decoded, dec_len = infer(inputs, lens)
        print(f"selfcheck ok: decoded {decoded.shape}, lengths {dec_len.tolist()}")


if __name__ == "__main__":
    main()
