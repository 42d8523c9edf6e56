"""Phase-level profile of the joint/attention beam decode (VERDICT r3 #4).

Splits the beam-eval program into separately-jitted phases at the exact
shapes a config decodes (random params — phase cost does not depend on
trained weights):

  features   device_pipeline (waveform -> stacked features)
  encode     encoder fwd + CTC head
  beam       attention_beam_search given a precomputed encoder pass
  rescore    joint CTC-attention re-ranking of the beam output
  full       the production make_beam_eval_step program

so the "attack the top item" decision is measured, not guessed. Random
logits make EOS emission unlikely, so the beam loop runs its full
max_decode_length — this is the UPPER bound per-step cost (the early-exit
while_loop typically stops several times sooner on trained models).

Usage: python benchmarks/attention_beam_profile.py [config.yml ...]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup  # noqa: E402


def bench(fn, sync, n=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorflow_end2end_speech_recognition_tpu.data import Dataset
    from tensorflow_end2end_speech_recognition_tpu.decoding.attention_beam import (
        attention_beam_search,
    )
    from tensorflow_end2end_speech_recognition_tpu.decoding.joint_rescoring import (
        joint_rescore,
    )
    from tensorflow_end2end_speech_recognition_tpu.train import att_task
    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
        build_task,
        cmvn_stats_for,
        feature_dim_of,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    cfgs = sys.argv[1:] or [str(REPO / "configs" / "ls960_joint_bpe.yml")]
    for cfg_path in cfgs:
        exp = ExperimentConfig.from_yaml(cfg_path)
        _, dev_utts, test_utts, tokenizer = build_corpus_splits(exp)
        task, task_mod = build_task(exp, tokenizer, feature_dim_of(test_utts))
        if task_mod is not att_task:
            print(f"skip {cfg_path}: not an attention/joint config")
            continue
        params = task_mod.init_params(jax.random.PRNGKey(exp.seed), task)
        ds = Dataset(test_utts, min(32, len(test_utts)),
                     cmvn_stats=cmvn_stats_for(exp, task, test_utts))
        batch = next(ds.batches(0))
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}
        beam = max(exp.beam_width, 1)
        cfg = task.model
        sync = lambda out: float(
            jnp.sum(jax.tree.leaves([t for t in jax.tree.leaves(out)
                                     if hasattr(t, "dtype")][0]))
        )

        pipeline = jax.jit(lambda b: task_mod.device_pipeline(task, b))
        feats, feat_len = pipeline(jb)
        t_feat = bench(lambda: pipeline(jb), lambda o: float(jnp.sum(o[0])))

        from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import encode

        enc_fn = jax.jit(lambda p, f, fl: encode(p, cfg, f, fl, train=False))
        pre = enc_fn(params, feats, feat_len)
        t_enc = bench(lambda: enc_fn(params, feats, feat_len),
                      lambda o: float(jnp.sum(o[0].outputs)))

        beam_fn = jax.jit(
            lambda p, f, fl, pre: attention_beam_search(
                p, cfg, f, fl, beam_width=beam,
                length_penalty=exp.length_penalty, precomputed=pre,
            )
        )
        res = beam_fn(params, feats, feat_len, pre)
        t_beam = bench(lambda: beam_fn(params, feats, feat_len, pre),
                       lambda o: float(jnp.sum(o.scores)))

        t_rescore = None
        if cfg.is_joint:
            res_fn = jax.jit(
                lambda r: joint_rescore(r, exp.ctc_loss_weight, cfg.num_classes,
                                        exp.length_penalty)
            )
            res_fn(res)
            t_rescore = bench(lambda: res_fn(res), lambda o: float(jnp.sum(o.scores)))

        full_step = task_mod.make_beam_eval_step(
            task, beam, exp.length_penalty,
            joint_rescore_weight=exp.ctc_loss_weight if cfg.is_joint else None,
        )
        full_step(params, jb)
        t_full = bench(lambda: full_step(params, jb),
                       lambda o: float(jnp.sum(o[1])))

        audio_s = float(np.sum(batch["input_len"])) / (
            16000.0 if batch["inputs"].ndim == 2 else 100.0)
        print(json.dumps({
            "config": Path(cfg_path).name,
            "B": int(batch["inputs"].shape[0]), "W": beam,
            "T_enc": int(pre[0].outputs.shape[1]),
            "V": cfg.vocab, "max_len": cfg.max_decode_length,
            "audio_s": round(audio_s, 1),
            "ms": {
                "features": round(t_feat * 1e3, 2),
                "encode": round(t_enc * 1e3, 2),
                "beam_loop": round(t_beam * 1e3, 2),
                **({"rescore": round(t_rescore * 1e3, 2)} if t_rescore else {}),
                "full_step": round(t_full * 1e3, 2),
            },
            "rtf_full": f"{t_full / audio_s:.2e}",
        }), flush=True)


if __name__ == "__main__":
    main()
