"""bf16 STREAM dtype for the Pallas LSTM kernels — the round-5 headline lever.

Round 2 measured bf16 *in-kernel matmuls* as a wash at B=32 and parked the
dtype (the recurrent chain is matmul-issue-latency-bound there). But the
headline bench now quotes B=128, where the round-2/3 batch sweeps showed the
recurrence cost SCALES WITH ROWS (VPU + stream bandwidth — BASELINE.md
ablation): the binding resource is different, so the parked conclusion does
not transfer. This probe measures the new `compute_dtype: bfloat16` Pallas
path (bf16 xproj/ys/cs/dxproj HBM streams + bf16 hoisted input projections;
carried state and all gate math stay f32 in VMEM) against the f32 default:

  layer   fused bidi layer kernel, value+grad, per batch size
  step    full BLSTM-CTC train step at the headline shapes (B=128)

Usage:  python benchmarks/bf16_stream_probe.py [--layer-only]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tensorflow_end2end_speech_recognition_tpu.models.rnn import (  # noqa: E402
    RNNSpec,
    bidirectional_scan,
    init_bidirectional,
)


def sync(x):
    # block_until_ready lies on the axon backend; fetch a scalar instead
    return float(jnp.asarray(x).ravel()[0])


def time_fn(fn, *args, n=10):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


def layer_probe(b, t, h, d, dtype_name):
    spec = RNNSpec(cell="lstm", num_units=h, impl="pallas",
                   compute_dtype=dtype_name)
    if not spec.pallas_eligible:
        return None
    params = init_bidirectional(jax.random.PRNGKey(0), spec, d)
    xs = jnp.asarray(np.random.RandomState(0).randn(b, t, d).astype("float32"))
    lengths = jnp.full((b,), t, jnp.int32)

    def loss(p):
        ys = bidirectional_scan(p, spec, xs, lengths)
        return jnp.sum(ys.astype(jnp.float32) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    return time_fn(lambda: vg(params))


def step_probe(b, dtype_name):
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
    from tensorflow_end2end_speech_recognition_tpu.train import ctc_task
    from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer

    # headline shapes: 5x BLSTM-512, 12 s waveforms, 3/3 stacking, char CTC
    task = ctc_task.CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_layers=5,
                                  num_units=512, compute_dtype=dtype_name),
            num_classes=28,
        ),
        num_stack=3, num_skip=3,
    )
    params = ctc_task.init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    step = ctc_task.make_train_step(task, opt)
    opt_state = opt.init(params)
    rs = np.random.RandomState(0)
    batch = {
        "inputs": jnp.asarray(rs.randn(b, 192000).astype("float32") * 0.1),
        "input_len": jnp.full((b,), 192000, jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 28, size=(b, 60)).astype("int32")),
        "label_len": jnp.full((b,), 60, jnp.int32),
    }
    lr = jnp.asarray(1e-3, jnp.float32)
    state = (params, opt_state)

    def run():
        nonlocal state
        p, o, aux = step(state[0], state[1], batch, lr, jax.random.PRNGKey(1))
        state = (p, o)
        return aux["loss"]

    dt = time_fn(run)
    return dt, b / dt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--layer-only", action="store_true")
    args = ap.parse_args()

    result = {"layer_ms": {}, "step": {}}
    for b in (32, 64, 128):
        row = {}
        for dt_name in ("float32", "bfloat16"):
            v = layer_probe(b, 400, 512, 360, dt_name)
            row[dt_name] = round(v * 1e3, 2) if v else None
            print(f"[layer B={b} {dt_name}] {row[dt_name]} ms", flush=True)
        result["layer_ms"][str(b)] = row
    if not args.layer_only:
        for dt_name in ("float32", "bfloat16"):
            dt, ups = step_probe(128, dt_name)
            result["step"][dt_name] = {"ms": round(dt * 1e3, 1),
                                       "utts_per_sec": round(ups, 1)}
            print(f"[step B=128 {dt_name}] {result['step'][dt_name]}", flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
