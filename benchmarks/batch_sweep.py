"""Throughput vs batch size for the flagship LS-960 BLSTM-CTC train step.

Measured (BASELINE.md): throughput saturates at ~710 utts/s/chip from B=64
on — the recurrence's per-step cost scales with rows (VPU + stream
bandwidth), refuting the earlier matmul-issue-latency theory (25% MXU row
fill at B=32 suggested big-batch gains). B=256 exceeds the Pallas kernels'
scoped-VMEM fit and rides the lax.scan fallback at ~0.78x the kernel rate.
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
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (
    CTCTaskConfig, init_params, make_train_step)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer

seconds, sr = 12, 16000
task = CTCTaskConfig(
    model=CTCConfig(
        encoder=EncoderConfig(encoder_type="blstm", num_units=512, num_layers=5),
        num_classes=28,
    ),
    frontend=FrontendConfig(use_energy=False),
    num_stack=3, num_skip=3,
)
opt = build_optimizer("adam", clip_grad_norm=5.0)

for batch in (32, 64, 128, 256):
    # fresh params per batch: the train step donates params/opt_state
    params = init_params(jax.random.PRNGKey(0), task)
    rng = np.random.RandomState(0)
    jbatch = {
        "inputs": jnp.asarray(rng.randn(batch, seconds * sr).astype(np.float32) * 0.1),
        "input_len": jnp.full((batch,), seconds * sr, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 28, (batch, 40)).astype(np.int32)),
        "label_len": jnp.full((batch,), 40, jnp.int32),
    }
    opt_state = opt.init(params)
    step = make_train_step(task, opt)
    key = jax.random.PRNGKey(1)
    try:
        p, opt_state, aux = step(params, opt_state, jbatch, 1e-3, key)
        float(aux["loss"])
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            key, sub = jax.random.split(key)
            p, opt_state, aux = step(p, opt_state, jbatch, 1e-3, sub)
        float(aux["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"B={batch:4d}  {dt*1e3:7.1f} ms/step  {batch/dt:8.1f} utts/s/chip", flush=True)
    except Exception as e:
        print(f"B={batch:4d}  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
