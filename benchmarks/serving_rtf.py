"""End-to-end decode RTF: jitted pipeline vs frozen StableHLO serving artifact.

LS-960 flagship shapes (5x BLSTM-512 CTC, 32 x 12 s batch, waveform in ->
token ids out). The exported artifact (serving.py) bakes weights in and is
what a production server would run; this drive shows it costs nothing vs
the in-process jit path (same XLA program, AOT-staged).

Usage:  python benchmarks/serving_rtf.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup

setup()
import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.serving import (
    build_inference_fn,
    export_model,
    load_exported,
)
from tensorflow_end2end_speech_recognition_tpu.train import ctc_task

B, SEC, SR = 32, 12, 16000
AUDIO_S = B * SEC

task = ctc_task.CTCTaskConfig(
    model=CTCConfig(
        encoder=EncoderConfig(encoder_type="blstm", num_units=512, num_layers=5),
        num_classes=28,
    ),
    frontend=FrontendConfig(use_energy=False),
    num_stack=3,
    num_skip=3,
)
params = ctc_task.init_params(jax.random.PRNGKey(0), task)
rng = np.random.RandomState(0)
# device-resident inputs: measure the compute path, not the H2D copy (the
# remote axon tunnel's transfer cost is not representative of a production
# host-attached TPU; a real server would overlap upload with compute anyway)
inputs = jnp.asarray(rng.randn(B, SEC * SR).astype(np.float32) * 0.1)
lens = jnp.full((B,), SEC * SR, jnp.int32)


def timeit(name, fn, n=10):
    d, dl = fn(inputs, lens)
    float(jnp.sum(jnp.asarray(dl)))
    t0 = time.perf_counter()
    for _ in range(n):
        d, dl = fn(inputs, lens)
    float(jnp.sum(jnp.asarray(dl)))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:7.1f} ms/batch  RTF {dt / AUDIO_S:.2e}  "
          f"({AUDIO_S / dt:,.0f}x realtime/chip)")


for beam in (1, 20):
    tag = "greedy" if beam == 1 else f"beam-{beam}"
    direct = jax.jit(build_inference_fn(task, ctc_task, params, beam_width=beam))
    timeit(f"jit {tag}", direct)
    out = Path(f"/tmp/serving_{tag}.shlo")
    export_model(task, ctc_task, params, out, B, SEC * SR, beam_width=beam)
    frozen = load_exported(out)
    timeit(f"frozen artifact {tag}", frozen)
    print(f"  artifact size: {out.stat().st_size / 1e6:.1f} MB")
