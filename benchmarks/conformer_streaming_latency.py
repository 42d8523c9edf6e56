"""Streaming chunk latency for the chunk-causal conformer, with per-trial
spread (VERDICT r3 weak #3: the round-3 matrix read B=1 3.54 / B=8 5.25 /
B=32 2.40 ms — non-monotone in B and uninvestigated).

Same shapes as the round-3 measurement: 4x conformer-144, rotary,
left_context 32, 3/3 stacking, causal frontend, 100 ms chunks. Reports
min/median/p90 over many timed singles so remote-dispatch variance is
visible separately from real per-batch compute.

Usage:  python benchmarks/conformer_streaming_latency.py
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

task = ctc_task.CTCTaskConfig(
    model=CTCConfig(
        encoder=EncoderConfig(
            encoder_type="conformer", num_units=144, num_layers=4,
            num_heads=4, conv_kernel_size=15, ff_expansion=4,
            pos_encoding="rotary", left_context=32,
        ),
        num_classes=28,
    ),
    frontend=FrontendConfig(add_deltas=False, use_energy=False, cmvn="none"),
    num_stack=3, num_skip=3,
)
params = ctc_task.init_params(jax.random.PRNGKey(0), task)

for b, chunk in ((1, 1600), (2, 1600), (4, 1600), (8, 1600), (16, 1600),
                 (32, 1600), (8, 4800)):
    init_fn, step_fn = build_streaming_fn(task, params, chunk)
    step_fn = jax.jit(step_fn)
    state = init_fn(b)
    rng = np.random.RandomState(0)
    cl = jnp.full((b,), chunk, jnp.int32)
    ck = jnp.asarray(rng.randn(b, chunk).astype(np.float32) * 0.1)
    state, toks, n = step_fn(state, ck, cl)
    float(jnp.sum(n))  # sync (block_until_ready lies on this backend)
    # timed singles: each iteration syncs, so per-call spread is visible
    times = []
    for _ in range(60):
        t0 = time.perf_counter()
        state, toks, n = step_fn(state, ck, cl)
        float(jnp.sum(n))
        times.append(time.perf_counter() - t0)
    ts = np.sort(np.asarray(times)) * 1e3
    # pipelined loop as in the round-3 matrix (amortizes fetch latency)
    t0 = time.perf_counter()
    for _ in range(40):
        state, toks, n = step_fn(state, ck, cl)
    float(jnp.sum(n))
    loop = (time.perf_counter() - t0) / 40 * 1e3
    dur = chunk / 16000.0 * 1e3
    print(
        f"B={b:3d} chunk={dur:5.0f} ms  loop {loop:6.2f} ms  "
        f"single min/med/p90 {ts[0]:6.2f}/{np.median(ts):6.2f}/{ts[int(0.9*len(ts))]:6.2f} ms  "
        f"RTF {loop/dur:.3f}",
        flush=True,
    )
