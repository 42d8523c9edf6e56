"""Step-time ablation at the headline shapes: where does the time go?

Round 2 ran this by hand at B=32 f32 (BASELINE.md "Step-time ablation +
MFU accounting"); this script makes it repeatable and dtype-aware so the
bf16-stream path (round 5) gets the same piece-level accounting:

  frontend   waveform -> stacked features, fwd only
  enc_fwd    encoder forward (5x BLSTM-512)
  enc_grad   encoder value+grad
  ctc_grad   CTC loss value+grad on encoder-shaped logits
  full       the production train step (frontend + encoder + CTC + adam)

Pieces are jitted separately, so their sum exceeds the full step wherever
XLA overlaps them (that gap is itself informative).

Usage:  python benchmarks/step_ablation.py [B] [dtype]   (default 128 bfloat16)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.models.encoders import (  # noqa: E402
    EncoderConfig,
    apply_encoder,
    init_encoder,
)
from tensorflow_end2end_speech_recognition_tpu.ops.ctc import ctc_loss  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.train import ctc_task  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"


def timeit(fn, *args, n=10):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # sync (axon)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.RandomState(0)
    task = ctc_task.CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_layers=5,
                                  num_units=512, compute_dtype=DTYPE),
            num_classes=28,
        ),
        frontend=FrontendConfig(use_energy=False),
        num_stack=3, num_skip=3,
    )
    batch = {
        "inputs": jnp.asarray(rng.randn(B, 192000).astype(np.float32) * 0.1),
        "input_len": jnp.full((B,), 192000, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 28, (B, 40)).astype(np.int32)),
        "label_len": jnp.full((B,), 40, jnp.int32),
    }
    res = {"B": B, "dtype": DTYPE}

    pipeline = jax.jit(lambda b: ctc_task.device_pipeline(task, b))
    feats, feat_len = pipeline(batch)
    res["frontend_ms"] = round(timeit(pipeline, batch), 2)

    ecfg = task.model.encoder
    eparams = init_encoder(jax.random.PRNGKey(0), ecfg, feats.shape[-1])
    enc_fwd = jax.jit(lambda p, x, l: apply_encoder(p, ecfg, x, l).outputs)
    res["enc_fwd_ms"] = round(timeit(enc_fwd, eparams, feats, feat_len), 2)

    enc_grad = jax.jit(jax.value_and_grad(
        lambda p: jnp.sum(apply_encoder(p, ecfg, feats, feat_len
                                        ).outputs.astype(jnp.float32) ** 2)))
    res["enc_grad_ms"] = round(timeit(enc_grad, eparams), 2)

    enc = apply_encoder(eparams, ecfg, feats, feat_len)
    tprime = enc.outputs.shape[1]
    logits = jnp.asarray(rng.randn(B, tprime, 29).astype(np.float32))
    llen = jnp.minimum(enc.lengths, tprime)

    def ctc_fn(lg):
        return jnp.mean(ctc_loss(lg, llen, batch["labels"], batch["label_len"],
                                 blank_id=28))

    ctc_grad = jax.jit(jax.value_and_grad(ctc_fn))
    res["ctc_grad_ms"] = round(timeit(ctc_grad, logits), 2)

    params = ctc_task.init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    step = ctc_task.make_train_step(task, opt)

    state = {"p": params, "o": opt_state}

    def full():
        p, o, aux = step(state["p"], state["o"], batch,
                         jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(1))
        state["p"], state["o"] = p, o
        return aux["loss"]

    res["full_ms"] = round(timeit(full), 2)
    res["utts_per_sec"] = round(B / (res["full_ms"] / 1e3), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
