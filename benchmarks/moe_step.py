"""MoE-conformer train-step cost vs the dense conformer, single chip.

Full CTC train step (waveform frontend + conformer encoder + Pallas CTC +
adam) on B=32 x 12 s utterances, 3/3 stacking (T'=400), char labels —
``configs/ls960_moe_conformer.yml`` shapes vs ``ls960_conformer_ctc.yml``.

Single-chip MoE pays E x the final-FF FLOPs (dense-evaluation dispatch;
parallel/ep.py shards that E axis at pod scale), so this measures the
single-chip premium for E x the FF parameters, plus the step at a larger
dim where the FF share is bigger.

Usage: python benchmarks/moe_step.py [batch] [seconds] [experts]
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


def run_case(name, batch, seconds, moe, dim, layers, heads):
    sr, num_classes, u = 16000, 28, 40
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(
                encoder_type="conformer", num_units=dim, num_layers=layers,
                num_heads=heads, conv_kernel_size=15, ff_expansion=4,
                moe_experts=moe, moe_top_k=2,
            ),
            num_classes=num_classes,
        ),
        frontend=FrontendConfig(use_energy=False, add_deltas=False),
        num_stack=3, num_skip=3,
    )
    rng = np.random.RandomState(0)
    jbatch = {
        "inputs": jnp.asarray(rng.randn(batch, seconds * sr).astype(np.float32) * 0.1),
        "input_len": jnp.full((batch,), seconds * sr, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, num_classes, (batch, u)).astype(np.int32)),
        "label_len": jnp.full((batch,), u, jnp.int32),
    }
    params = init_params(jax.random.PRNGKey(0), task)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    step = make_train_step(task, opt)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    params, opt_state, aux = step(params, opt_state, jbatch, 1e-3, key)
    print(f"[{name}] params {n_params / 1e6:.1f}M  "
          f"compile+first {time.perf_counter() - t0:.1f}s "
          f"loss {float(aux['loss']):.2f}"
          + (f" moe_aux {float(aux['moe_aux']):.4f}" if "moe_aux" in aux else ""))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        key, sub = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, jbatch, 1e-3, sub)
    float(aux["loss"])  # sync (block_until_ready lies on this backend)
    dt = (time.perf_counter() - t0) / n
    print(f"[{name}] steady {dt * 1e3:.1f} ms/step = {batch / dt:.1f} utts/s/chip")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    experts = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    for dim, layers, heads in ((144, 4, 4), (256, 8, 4)):
        dense = run_case(f"dense {layers}x{dim}", batch, seconds, 0, dim, layers, heads)
        moe = run_case(f"moe-E{experts} {layers}x{dim}", batch, seconds,
                       experts, dim, layers, heads)
        print(f"==> {layers}x{dim}: moe/dense step ratio {moe / dense:.2f}x "
              f"(single chip computes all {experts} experts; "
              f"ep={experts} shards would pay ~the dense rate)")


if __name__ == "__main__":
    main()
