"""Transducer streaming chunk latency on a production-shaped model (TPU).

Same protocol as ``streaming_latency.py`` but with the RNN-T chunk step:
causal 4xLSTM-512 encoder + LSTM-512 prediction net + joint-512, greedy
frame-synchronous decode carried across chunks (max 4 symbols/frame —
each frame pays up to 4 prediction-net + joint evaluations inside the
per-frame scan, which is the structural latency delta vs the CTC step's
single argmax).

Usage:  python benchmarks/transducer_streaming_latency.py
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup
setup()
import jax, jax.numpy as jnp
import numpy as np
from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.models.transducer import TransducerConfig
from tensorflow_end2end_speech_recognition_tpu.streaming import build_streaming_fn
from tensorflow_end2end_speech_recognition_tpu.train import transducer_task

task = transducer_task.TransducerTaskConfig(
    model=TransducerConfig(
        encoder=EncoderConfig(encoder_type="lstm", num_units=512, num_layers=4),
        num_classes=28, pred_num_units=512, embedding_dim=128, joint_dim=512,
    ),
    frontend=FrontendConfig(add_deltas=False, use_energy=False, cmvn="none"),
)
params = transducer_task.init_params(jax.random.PRNGKey(0), task)

for b, chunk in ((1, 1600), (8, 1600), (32, 1600), (8, 4800)):
    init_fn, step_fn = build_streaming_fn(task, params, chunk)
    step_fn = jax.jit(step_fn)
    state = init_fn(b)
    rng = np.random.RandomState(0)
    cl = jnp.full((b,), chunk, jnp.int32)
    ck = jnp.asarray(rng.randn(b, chunk).astype(np.float32) * 0.1)
    state, toks, n = step_fn(state, ck, cl)
    float(jnp.sum(n))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, toks, n = step_fn(state, ck, cl)
    float(jnp.sum(n))
    dt = (time.perf_counter() - t0) / iters
    dur = chunk / 16000.0
    print(f"B={b:3d} chunk={dur*1000:5.0f} ms  step {dt*1e3:6.2f} ms  "
          f"RTF {dt/dur:.3f}  ({b*dur/dt:7.1f}x realtime/chip)", flush=True)
