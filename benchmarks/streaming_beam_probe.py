"""Isolate the streaming-BEAM per-chunk cost (round-2 anomaly: 832 ms/chunk).

Times, on the production-shaped causal model (4xLSTM-512 char CTC):
  1. greedy streaming step        (baseline: ~2-3 ms in round 2)
  2. beam streaming step          (what measured 832 ms in round 2)
  3. a no-op jit over the same beam StreamState pytree (pure dispatch cost)
  4. beam_advance alone on precomputed chunk logits (pure beam compute)

Usage:  python benchmarks/streaming_beam_probe.py [B] [W]
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup
setup()
import jax, jax.numpy as jnp
import numpy as np
from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.streaming import build_streaming_fn
from tensorflow_end2end_speech_recognition_tpu.train import ctc_task

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CHUNK = 1600
ITERS = 20

task = ctc_task.CTCTaskConfig(
    model=CTCConfig(
        encoder=EncoderConfig(encoder_type="lstm", num_units=512, num_layers=4),
        num_classes=28,
    ),
    frontend=FrontendConfig(add_deltas=False, use_energy=False, cmvn="none"),
)
params = ctc_task.init_params(jax.random.PRNGKey(0), task)
rng = np.random.RandomState(0)
ck = jnp.asarray(rng.randn(B, CHUNK).astype(np.float32) * 0.1)
cl = jnp.full((B,), CHUNK, jnp.int32)


def bench(fn, *args, n=ITERS, sync=None):
    out = fn(*args)
    (sync or (lambda o: float(jnp.sum(o[-1]))))(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    (sync or (lambda o: float(jnp.sum(o[-1]))))(out)
    return (time.perf_counter() - t0) / n * 1e3, out


# 1. greedy step
gi, gs = build_streaming_fn(task, params, CHUNK)
gstep = jax.jit(gs)
state_g = gi(B)
ms, out = bench(lambda s: gstep(s, ck, cl), state_g)
print(f"1. greedy step           B={B}        {ms:8.2f} ms/chunk", flush=True)

# 2. beam step (state threaded through like the real driver does)
bi, bs, bf = build_streaming_fn(task, params, CHUNK, beam_width=W)
bstep = jax.jit(bs)
state_b = bi(B)
state_b, t, n = bstep(state_b, ck, cl); float(jnp.sum(n))
t0 = time.perf_counter()
for _ in range(ITERS):
    state_b, t, n = bstep(state_b, ck, cl)
float(jnp.sum(n))
ms_b = (time.perf_counter() - t0) / ITERS * 1e3
print(f"2. beam step             B={B} W={W}  {ms_b:8.2f} ms/chunk", flush=True)

# 3. dispatch-only: identity-ish jit over the same state pytree
@jax.jit
def passthru(state, chunk, chunk_len):
    leaves = jax.tree.leaves(state)
    return state, jnp.sum(chunk) + jnp.sum(chunk_len), leaves[0]

sync3 = lambda o: float(o[1])
ms3, _ = bench(lambda s: passthru(s, ck, cl), state_b, sync=sync3)
print(f"3. state passthru jit    (beam pytree) {ms3:8.2f} ms/call", flush=True)

# 4. beam_advance alone on precomputed logits (10 frames = one chunk)
from tensorflow_end2end_speech_recognition_tpu.decoding.ctc_prefix_beam import (
    beam_advance, beam_init,
)
logits = jnp.asarray(rng.randn(B, CHUNK // 160, 29).astype(np.float32))
vl = jnp.full((B,), CHUNK // 160, jnp.int32)
adv = jax.jit(lambda st: beam_advance(st, logits, vl, 28, top_k_classes=16))
bst = beam_init(B, W, 200)
sync4 = lambda st: float(jnp.sum(st.lengths))
ms4, _ = bench(adv, bst, sync=sync4)
print(f"4. beam_advance alone    (10 frames)   {ms4:8.2f} ms/call", flush=True)
