"""Measure the beam-loop unroll win (round-5 attack on VERDICT r4 #3a).

The phase profile (attention_beam_profile.py) showed the attention beam
decode is 98.7% while_loop iterations at ~2.55 ms each — per-iteration
sequencing overhead, not math. This probe times attention_beam_search at
unroll in {1, 2, 4, 8} on the same shapes (random params = full-length
upper bound, no early exit), plus the full production beam-eval step
before/after, so the RTF delta is measured end to end.

Usage: python benchmarks/beam_unroll_probe.py [config.yml ...]
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
    from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import encode
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

        pipeline = jax.jit(lambda b: task_mod.device_pipeline(task, b))
        feats, feat_len = pipeline(jb)
        enc_fn = jax.jit(lambda p, f, fl: encode(p, cfg, f, fl, train=False))
        pre = enc_fn(params, feats, feat_len)

        beam_ms = {}
        ref = None
        arms = [(k, True) for k in (1, 2, 4, 8) if not cfg.max_decode_length % k]
        arms += [(k, False) for k in (1, 8) if not cfg.max_decode_length % k]
        for k, fused in arms:
            beam_fn = jax.jit(
                lambda p, f, fl, pre, k=k, fused=fused: attention_beam_search(
                    p, cfg, f, fl, beam_width=beam,
                    length_penalty=exp.length_penalty, precomputed=pre,
                    unroll=k, fused=fused,
                )
            )
            res = beam_fn(params, feats, feat_len, pre)
            # unchanged-output check vs unroll=1 (the r3 bar's condition);
            # the unfused arms only need argmax-level agreement (the Pallas
            # read differs from the XLA path at float rounding)
            out = (np.asarray(res.tokens), np.asarray(res.scores))
            if ref is None:
                ref = out
            elif fused:
                np.testing.assert_array_equal(ref[0], out[0])
                np.testing.assert_array_equal(ref[1], out[1])
            beam_ms[f"k{k}" + ("" if fused else "_unfused")] = round(bench(
                lambda: beam_fn(params, feats, feat_len, pre),
                lambda o: float(jnp.sum(o.scores))) * 1e3, 2)

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
            "max_len": cfg.max_decode_length,
            "beam_loop_ms_by_unroll": beam_ms,
            "full_step_ms": round(t_full * 1e3, 2),
            "rtf_full": f"{t_full / audio_s:.2e}",
        }), flush=True)


if __name__ == "__main__":
    main()
