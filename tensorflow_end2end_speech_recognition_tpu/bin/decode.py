"""Decode entry point: restore a checkpoint and print transcripts.

Reference parity: ``experiments/<corpus>/visualization/decode_*.py`` printed
decoded hypotheses next to references (SURVEY.md §2.7). Supports greedy,
CTC prefix beam (``--beam-width``), attention beam, and joint CTC-attention
rescoring (``--joint-rescore``), all running on device.

    python -m tensorflow_end2end_speech_recognition_tpu.bin.decode \
        /tmp/model_dir [--beam-width 20] [--joint-rescore] [--num-utts 8]
"""

from __future__ import annotations

import argparse

from ..utils.jax_setup import setup as _jax_setup
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Dataset
from ..decoding import attention_beam_search, ctc_greedy_decode, ctc_prefix_beam_search, joint_rescore
from ..models.ctc import apply_ctc
from ..train.checkpoint import CheckpointManager
from ..train.ctc_task import device_pipeline
from ..train.loop import build_corpus_splits, build_task, cmvn_stats_for, feature_dim_of
from ..utils.config import ExperimentConfig


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--beam-width", type=int, default=1)
    ap.add_argument("--joint-rescore", action="store_true")
    ap.add_argument("--length-penalty", type=float, default=0.0)
    ap.add_argument("--num-utts", type=int, default=8)
    ap.add_argument("--nbest", type=int, default=1,
                    help="print the top-N beam hypotheses per utterance "
                         "(beam decodes only; capped at beam width)")
    ap.add_argument("--data", choices=("dev", "test"), default="test")
    ap.add_argument("--lm-dir", default=None, help="RNN-LM dir from bin.train_lm")
    ap.add_argument("--lm-weight", type=float, default=0.3)
    args = ap.parse_args(argv)
    _jax_setup()

    lm_params = lm_cfg = None
    if args.lm_dir:
        from .train_lm import load_lm

        lm_params, lm_cfg = load_lm(args.lm_dir)

    model_dir = Path(args.model_dir)
    exp = ExperimentConfig.from_yaml(model_dir / "config.yml")
    _, dev_utts, test_utts, tokenizer = build_corpus_splits(exp, need=("dev", "test"))
    utts = dev_utts if args.data == "dev" else test_utts
    task, task_mod = build_task(exp, tokenizer, feature_dim_of(utts))
    params = task_mod.init_params(jax.random.PRNGKey(exp.seed), task)
    epoch, state = CheckpointManager(model_dir / "checkpoints").restore(
        {"params": params}, args.epoch
    )
    params = state["params"]
    is_att = exp.model_type in ("attention", "joint_ctc_attention")

    ds = Dataset(
        utts[: args.num_utts], min(args.num_utts, len(utts)),
        cmvn_stats=cmvn_stats_for(exp, task, utts[: args.num_utts]),
    )
    batch = next(ds.batches(0))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}

    if exp.model_type == "transducer":
        from ..decoding.transducer_greedy import transducer_greedy_decode
        from ..models.transducer import encode

        t_fusion = None
        if lm_params is not None and args.beam_width > 1:
            from ..models.lm import make_fusion_lm

            t_fusion = make_fusion_lm(
                lm_params, lm_cfg, sos_id=lm_cfg.vocab - 2,
                num_ctc_classes=task.model.vocab_with_blank,
            )

        @jax.jit
        def run(params, b):
            feats, fl = device_pipeline(task, b)
            out = encode(params, task.model, feats, fl)
            if args.beam_width > 1:
                from ..decoding.transducer_beam import transducer_beam_search

                res = transducer_beam_search(
                    params, task.model, out.f_proj, out.enc_len,
                    beam_width=args.beam_width,
                    fusion_lm=t_fusion,
                    lm_weight=args.lm_weight if t_fusion is not None else 0.0,
                )
                return res.tokens, res.lengths, res.scores  # [B, W, ...]
            d, dl = transducer_greedy_decode(params, task.model, out.f_proj, out.enc_len)
            return d[:, None], dl[:, None], jnp.zeros((d.shape[0], 1))

        hyps, hyp_len, scores = (np.asarray(x) for x in run(params, jb))
    elif is_att:
        cfg = task.model

        @jax.jit
        def run(params, b):
            feats, fl = device_pipeline(task, b)
            return attention_beam_search(
                params, cfg, feats, fl,
                beam_width=max(args.beam_width, 1),
                length_penalty=args.length_penalty,
                lm_params=lm_params, lm_cfg=lm_cfg,
                lm_weight=args.lm_weight if lm_params is not None else 0.0,
            )

        result = run(params, jb)
        if args.joint_rescore:
            if not cfg.is_joint:
                raise SystemExit("--joint-rescore requires a joint_ctc_attention model")
            result = joint_rescore(
                result, cfg.ctc_loss_weight, cfg.num_classes, args.length_penalty
            )
        hyps = np.asarray(result.tokens)  # [B, W, L]
        hyp_len = np.asarray(result.lengths)
        scores = np.asarray(result.scores)
    else:
        if lm_params is not None and args.beam_width <= 1:
            print("WARNING: --lm-dir has no effect on greedy decode "
                  "(beam_width <= 1); pass --beam-width N for LM fusion")
        lm_fusion = None
        if lm_params is not None:
            # carried-state shallow fusion: LM state rides the beam and
            # advances once per accepted token (O(T) LM steps per utterance)
            from ..models.lm import make_fusion_lm

            lm_fusion = make_fusion_lm(
                lm_params, lm_cfg, sos_id=lm_cfg.vocab - 2,
                num_ctc_classes=task.model.vocab_with_blank,
            )

        @jax.jit
        def run(params, b):
            feats, fl = device_pipeline(task, b)
            out = apply_ctc(params, task.model, feats, fl)
            if args.beam_width > 1:
                p, l, s = ctc_prefix_beam_search(
                    out.logits, out.logit_len, task.model.blank_id,
                    beam_width=args.beam_width,
                    fusion_lm=lm_fusion,
                    lm_weight=args.lm_weight if lm_fusion is not None else 0.0,
                )
                return p, l, s  # [B, W, ...]
            d, dl = ctc_greedy_decode(out.logits, out.logit_len, task.model.blank_id)
            return d[:, None], dl[:, None], jnp.zeros((d.shape[0], 1))

        hyps, hyp_len, scores = (np.asarray(x) for x in run(params, jb))

    print(f"# model {exp.model_type}/{exp.encoder_type} epoch {epoch} "
          f"beam {args.beam_width}{' +joint-rescore' if args.joint_rescore else ''}")
    n_best = max(1, min(args.nbest, hyps.shape[1]))
    for i, name in enumerate(batch["names"]):
        if name is None:
            continue
        ref = " ".join(tokenizer.decode([j for j in batch["labels"][i] if j >= 0]))
        print(f"[{name}] score {scores[i, 0]:.2f}")
        print(f"  REF: {ref}")
        for r in range(n_best):
            hyp = " ".join(tokenizer.decode(hyps[i, r][: hyp_len[i, r]]))
            tag = "HYP" if r == 0 else f"HYP{r + 1} (score {scores[i, r]:.2f})"
            print(f"  {tag}: {hyp}")


if __name__ == "__main__":
    main()
