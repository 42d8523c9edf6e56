"""Isolate the streaming-BEAM per-chunk cost (round-2 anomaly: 832 ms/chunk).

RESOLVED (round 3): the cost was never dispatch — ``beam_init`` shipped
weak-typed pb/pnb leaves, so the FIRST advance changed their avals
(weak->strong) and every jitted driver that threads the state compiled its
chunk program twice; the remote backend's multi-second second compile,
divided by the benchmark's iteration count, read as "832 ms/chunk".
With explicit dtypes the threaded beam step measures ~1.5 ms/chunk.

Times, on the production-shaped causal model (4xLSTM-512 char CTC), with
the state THREADED through every step exactly like a real stream driver:
  1. greedy streaming step
  2. beam streaming step
  3. a no-op jit over the same beam StreamState pytree (pure dispatch cost)
  4. beam_advance alone on precomputed chunk logits (pure beam compute;
     logits passed as an argument — closing over them lets XLA fold the
     candidate generation and report pure dispatch)

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


def bench_threaded(step, state, sync, n=ITERS):
    """Thread state -> next call, as a real stream driver does."""
    state = step(state)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(state)
    sync(state)
    return (time.perf_counter() - t0) / n * 1e3


# 1. greedy step
gi, gs = build_streaming_fn(task, params, CHUNK)
gstep = jax.jit(gs)
ms = bench_threaded(lambda s: gstep(s, ck, cl)[0], gi(B),
                    lambda s: float(jnp.sum(s.samples_seen)))
print(f"1. greedy step           B={B}        {ms:8.2f} ms/chunk", flush=True)

# 2. beam step (state threaded through like the real driver does)
bi, bs, bf = build_streaming_fn(task, params, CHUNK, beam_width=W)
bstep = jax.jit(bs)
ms_b = bench_threaded(lambda s: bstep(s, ck, cl)[0], bi(B),
                      lambda s: float(jnp.sum(s.beam.lengths)))
print(f"2. beam step             B={B} W={W}  {ms_b:8.2f} ms/chunk", flush=True)

# 3. dispatch-only: identity-ish jit over the same state pytree
@jax.jit
def passthru(state, chunk, chunk_len):
    return jax.tree.map(lambda x: x + jnp.zeros((), x.dtype), state)

ms3 = bench_threaded(lambda s: passthru(s, ck, cl), bi(B),
                     lambda s: float(jnp.sum(s.samples_seen)))
print(f"3. state passthru jit    (beam pytree) {ms3:8.2f} ms/call", flush=True)

# 4. beam_advance alone on precomputed logits (10 frames = one chunk)
from tensorflow_end2end_speech_recognition_tpu.decoding.ctc_prefix_beam import (
    beam_advance, beam_init,
)
logits = jnp.asarray(rng.randn(B, CHUNK // 160, 29).astype(np.float32))
vl = jnp.full((B,), CHUNK // 160, jnp.int32)
adv = jax.jit(lambda st, lg: beam_advance(st, lg, vl, 28, top_k_classes=16))
ms4 = bench_threaded(lambda st: adv(st, logits), beam_init(B, W, 200),
                     lambda st: float(jnp.sum(st.lengths)))
print(f"4. beam_advance alone    (10 frames)   {ms4:8.2f} ms/call", flush=True)

# 5. beam step + RNN-LM shallow fusion (round 3: the carried FusionLM
# state rides StreamState.beam; one LM step per frame's accepted tokens)
from tensorflow_end2end_speech_recognition_tpu.models.lm import LMConfig, init_lm

lm_cfg = LMConfig(vocab=30, num_units=512, embedding_dim=256)
lm_params = init_lm(jax.random.PRNGKey(1), lm_cfg)
li, ls, lf = build_streaming_fn(task, params, CHUNK, beam_width=W,
                                lm=(lm_params, lm_cfg), lm_weight=0.3)
lstep = jax.jit(ls)
ms5 = bench_threaded(lambda s: lstep(s, ck, cl)[0], li(B),
                     lambda s: float(jnp.sum(s.beam.lengths)))
print(f"5. beam step + LM fusion B={B} W={W} LM 512u {ms5:8.2f} ms/chunk", flush=True)
