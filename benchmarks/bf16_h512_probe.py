"""VERDICT r2 #7a: measure ``compute_dtype: bfloat16`` at conformer /
transformer H=512 (round 2 only measured d<=256, where per-matmul casts
beat the MXU-rate gain and bf16 lost: 47.5 -> 57.8 ms/step at 8x256).

Full CTC train step (waveform frontend + encoder + Pallas CTC + adam),
B=32 x 12 s, 3/3 stacking (T=400), 8 layers x 512 dims x 8 heads.

Usage:  python benchmarks/bf16_h512_probe.py {conformer|transformer} {float32|bfloat16}
"""

from __future__ import annotations

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
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import (  # noqa: E402
    CTCTaskConfig,
    init_params,
    make_train_step,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer  # noqa: E402

enc_type, dtype = sys.argv[1], sys.argv[2]
B, SECONDS, SR, U = 32, 12, 16000, 40

task = CTCTaskConfig(
    model=CTCConfig(
        encoder=EncoderConfig(
            encoder_type=enc_type, num_units=512, num_layers=8, num_heads=8,
            ff_expansion=4, compute_dtype=dtype,
        ),
        num_classes=28,
    ),
    frontend=FrontendConfig(use_energy=False),
    num_stack=3,
    num_skip=3,
)
rng = np.random.RandomState(0)
batch = {
    "inputs": jnp.asarray(rng.randn(B, SECONDS * SR).astype(np.float32) * 0.1),
    "input_len": jnp.full((B,), SECONDS * SR, jnp.int32),
    "labels": jnp.asarray(rng.randint(0, 28, (B, U)), jnp.int32),
    "label_len": jnp.full((B,), U, jnp.int32),
}
params = init_params(jax.random.PRNGKey(0), task)
opt = build_optimizer("adam", clip_grad_norm=5.0)
opt_state = opt.init(params)
step = make_train_step(task, opt)
key = jax.random.PRNGKey(1)

t0 = time.perf_counter()
params, opt_state, aux = step(params, opt_state, batch, 1e-3, key)
print(f"[{enc_type}/{dtype}] compile+step1 {time.perf_counter() - t0:.1f}s "
      f"loss={float(aux['loss']):.3f}", flush=True)

N = 10
t0 = time.perf_counter()
for _ in range(N):
    key, sub = jax.random.split(key)
    params, opt_state, aux = step(params, opt_state, batch, 1e-3, sub)
loss = float(aux["loss"])
dt = (time.perf_counter() - t0) / N
print(f"[{enc_type}/{dtype}] steady {dt * 1e3:.1f} ms/step = "
      f"{B / dt:.1f} utts/s/chip loss={loss:.3f}", flush=True)
