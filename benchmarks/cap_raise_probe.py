"""Round-3 cap-raise probes: the T=1198 2-layer repro now PASSES (see
compiler_limit_probe.py), so test the two real guarded compositions before
raising `pallas_fits` T<=800 and `seq2seq` pallas_t_cap=200:

  joint400  - full joint CTC-attention train step, stacked T=400, encoder
              FORCED onto Pallas kernels (the round-2 crash: 2/2 at this
              exact composition; guard = pallas_t_cap=200)
  ctc1198   - full char CTC train step at unstacked T=1198, 5-layer
              pyramidal encoder FORCED onto Pallas kernels (the round-2
              crash class behind pallas_fits T<=800; ls960_joint.yml's
              char encoder shape)

Each is a separate process invocation: a crash poisons the worker ~10 min,
so health-check before trusting a pass after any failure.

Usage:  python benchmarks/cap_raise_probe.py {joint400|ctc1198}
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

import tensorflow_end2end_speech_recognition_tpu.models.encoders as encoders  # noqa: E402
import tensorflow_end2end_speech_recognition_tpu.models.seq2seq as s2s  # noqa: E402
import tensorflow_end2end_speech_recognition_tpu.ops.pallas.lstm_kernel as lk  # noqa: E402

mode = sys.argv[1]
variant = sys.argv[2] if len(sys.argv) > 2 else "pallas"
B, SECONDS, SR = 32, 12, 16000


def health(tag):
    x = jnp.ones((256, 256))
    print(f"health[{tag}]: {float(jnp.sum(x @ x)):.0f}", flush=True)


# lift the guards inside this process only (variant "scan" keeps them:
# that is the currently-shipped guarded path, the A/B denominator)
if variant != "scan":
    _orig_fits = lk.pallas_fits
    lk.pallas_fits = lambda b, h, t=None: _orig_fits(b, h, None)  # drop T cap
    _orig_apply = encoders.apply_encoder
    s2s.apply_encoder = lambda *a, pallas_t_cap=800, **k: _orig_apply(
        *a, pallas_t_cap=1300, **k
    )
if variant == "ktbwd2":
    # the joint400 composition overflows scoped VMEM by 2.38M at the bidi
    # backward's kt=4; kt=2 halves the streamed block footprint (measured
    # ~flat perf at B=64 in lstm_kt_sweep.py)
    lk._BLOCK_T_BIDI_BWD = 2

health("pre")
rng = np.random.RandomState(0)

if mode == "joint400":
    from tensorflow_end2end_speech_recognition_tpu.data.toy_corpus import ToyCorpus
    from tensorflow_end2end_speech_recognition_tpu.train.loop import build_task
    from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig

    U = 60
    exp = ExperimentConfig.from_yaml(REPO / "configs" / "ls960_joint_bpe.yml")
    tok = ToyCorpus(label_type=exp.label_type, num_utts=4).tokenizer
    task, task_mod = build_task(exp, tok)
    batch = {
        "inputs": jnp.asarray(rng.randn(B, SECONDS * SR).astype(np.float32) * 0.1),
        "input_len": jnp.full((B,), SECONDS * SR, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, tok.num_units, (B, U)), jnp.int32),
        "label_len": jnp.full((B,), U, jnp.int32),
    }
    params = task_mod.init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer(exp.optimizer, clip_grad_norm=exp.clip_grad_norm)
    step = task_mod.make_train_step(task, opt)
    args = lambda p, o, k, i: (p, o, batch, 1e-3, k, i)
else:  # ctc1198
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
    from tensorflow_end2end_speech_recognition_tpu.train import ctc_task as task_mod
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import CTCTaskConfig
    from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer

    U = 100
    task = CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(
                encoder_type="pyramidal_blstm", num_units=512, num_layers=5,
                num_pyramid_levels=2,
            ),
            num_classes=28,
        ),
        frontend=FrontendConfig(use_energy=False),
        num_stack=1, num_skip=1,  # T=1198
    )
    batch = {
        "inputs": jnp.asarray(rng.randn(B, SECONDS * SR).astype(np.float32) * 0.1),
        "input_len": jnp.full((B,), SECONDS * SR, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 28, (B, U)), jnp.int32),
        "label_len": jnp.full((B,), U, jnp.int32),
    }
    params = task_mod.init_params(jax.random.PRNGKey(0), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    step = task_mod.make_train_step(task, opt)
    args = lambda p, o, k, i: (p, o, batch, 1e-3, k)

opt_state = opt.init(params)
key = jax.random.PRNGKey(1)
t0 = time.perf_counter()
out = step(*args(params, opt_state, key, 0))
params, opt_state, aux = out
loss = float(aux["loss"])
print(f"[{mode}] PASS compile+step1 {time.perf_counter() - t0:.1f}s "
      f"loss={loss:.3f}", flush=True)

N = 10
t0 = time.perf_counter()
for i in range(N):
    key, sub = jax.random.split(key)
    params, opt_state, aux = step(*args(params, opt_state, sub, i + 1))
loss = float(aux["loss"])
dt = (time.perf_counter() - t0) / N
print(f"[{mode}] steady {dt * 1e3:.1f} ms/step = {B / dt:.1f} utts/s/chip "
      f"loss={loss:.3f}", flush=True)
health("post")
