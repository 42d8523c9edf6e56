"""Headline benchmark: LS-960-shape BLSTM-CTC training throughput on TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "utterances/sec/chip", "vs_baseline": N}

The metric matches BASELINE.json: utterances/sec/chip for LibriSpeech-960-
shape BLSTM-CTC training (5x BLSTM-512, 40-mel fbank + deltas frontend,
3/3 frame stacking, ~12 s utterances), full train step (frontend +
encoder + CTC loss + grads + adam update) on device. ``vs_baseline`` divides
by the measured TF1-CPU reference step (benchmarks/tf1_cpu_baseline.json;
see benchmarks/tf1_cpu_baseline.py for the faithful TF1 graph-mode setup).

Batch is 128: the round-4 batch sweep (benchmarks/batch_sweep.py) measured
the B>=64 throughput plateau at 703-710 utts/s/chip vs 688-698 at B=32
(BASELINE.md round 4), so the headline quotes the saturated rate. The
TF1-CPU denominator is per-utterance and compute-bound, so it is batch-
insensitive on its side.

compute_dtype is bfloat16 (round 5): the B>=64 regime is bound by the
recurrent kernels' HBM streams, not matmul latency (round-2/3 ablations),
and the Pallas LSTM path now streams xproj/ys/cs/dxproj at bf16 while
keeping carried h/c state and all gate math f32 in VMEM — measured
706.0 -> 903.4 utts/s/chip at B=128 (benchmarks/bf16_stream_probe.py,
BASELINE.md round 5). Numerics: the bf16 path is pinned to the f32 scan
within rounding tolerance (tests/test_lstm_pallas.py) and the full-protocol
hard-corpus quality arm trains to f32-class test error at the probe's
predicted 1.28x rate (test 0.0131 vs f32 0.0138; BASELINE.md round 5).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def main():
    from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup

    setup()
    import jax
    import jax.numpy as jnp

    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
        CTCTaskConfig,
        init_params,
        make_train_step,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer

    batch, seconds, sr = 128, 12, 16000
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=512, num_layers=5,
                                  compute_dtype="bfloat16"),
            num_classes=28,
        ),
        frontend=FrontendConfig(use_energy=False),  # 40 mel x3 deltas = 120 (LS shape)
        num_stack=3,
        num_skip=3,
    )
    rng = np.random.RandomState(0)
    jbatch = {
        "inputs": jnp.asarray(rng.randn(batch, seconds * sr).astype(np.float32) * 0.1),
        "input_len": jnp.full((batch,), seconds * sr, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 28, (batch, 40)).astype(np.int32)),
        "label_len": jnp.full((batch,), 40, jnp.int32),
    }
    params = init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    step = make_train_step(task, opt)
    key = jax.random.PRNGKey(1)

    # warmup / compile. NOTE: on this environment's experimental remote TPU
    # backend, jax.block_until_ready returns before execution completes;
    # fetching the scalar (float()) is the only reliable synchronization.
    params, opt_state, aux = step(params, opt_state, jbatch, 1e-3, key)
    float(aux["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, jbatch, 1e-3, sub)
    float(aux["loss"])  # sync on the full dependency chain
    dt = (time.perf_counter() - t0) / n_steps
    utts_per_sec = batch / dt

    baseline_path = Path(__file__).parent / "benchmarks" / "tf1_cpu_baseline.json"
    if baseline_path.exists():
        baseline = json.loads(baseline_path.read_text())["value"]
    else:
        baseline = float("nan")
    print(
        json.dumps(
            {
                "metric": "ls960_blstm_ctc_train_throughput",
                "value": round(utts_per_sec, 2),
                "unit": "utterances/sec/chip",
                "vs_baseline": round(utts_per_sec / baseline, 2) if baseline == baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
