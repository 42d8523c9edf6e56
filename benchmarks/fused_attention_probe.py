"""TPU probe: fused Pallas attention read inside the differentiated training
decoder scan (VERDICT r2 #4). A/B vs unfused at two compositions:
  B. T=400 -> encoder on scan path (pallas_t_cap=200) + fused attention
  A. T=120 -> encoder on Pallas LSTM kernels + fused attention (crashier class)
Run B first; a crash poisons the worker ~10 min.
Usage: python benchmarks/fused_attention_probe.py {scan|pallas} {fused|unfused}
"""
import sys, time
from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup
setup()
import jax, jax.numpy as jnp, numpy as np
import tensorflow_end2end_speech_recognition_tpu.models.seq2seq as s2s
from tensorflow_end2end_speech_recognition_tpu.models.seq2seq import Seq2SeqConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.models.attention import AttentionConfig
from tensorflow_end2end_speech_recognition_tpu.train import att_task
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer

mode, variant = sys.argv[1], sys.argv[2]
T = 400 if mode == "scan" else 120
B, D, U = 32, 120, 60

if variant == "unfused":
    orig = s2s.attend
    s2s.attend = lambda *a, fused=False, **k: orig(*a, fused=False, **k)

cfg = Seq2SeqConfig(
    encoder=EncoderConfig(encoder_type="pyramidal_blstm", num_layers=5,
                          num_units=512, num_pyramid_levels=2),
    attention=AttentionConfig(attention_type="hybrid", attention_dim=256,
                              conv_width=101, conv_num_channels=10),
    num_classes=30, decoder_num_units=512, embedding_dim=256,
    max_decode_length=U,
)
task = att_task.AttTaskConfig(model=cfg, frontend=None, feature_dim=D)
params = att_task.init_params(jax.random.PRNGKey(0), task, D)
opt = build_optimizer("adam")
opt_state = opt.init(params)
step = att_task.make_train_step(task, opt)

rng = np.random.RandomState(0)
batch = {
    "inputs": jnp.asarray(rng.randn(B, T, D).astype(np.float32)),
    "input_len": jnp.full((B,), T, jnp.int32),
    "labels": jnp.asarray(rng.randint(0, 30, size=(B, U)), jnp.int32),
    "label_len": jnp.full((B,), U, jnp.int32),
}
key = jax.random.PRNGKey(1)
lr = jnp.asarray(3e-4)

t0 = time.perf_counter()
params, opt_state, aux = step(params, opt_state, batch, lr, key, 0)
print(f"[{mode}/{variant}] compile+step1: {time.perf_counter()-t0:.1f}s "
      f"loss={float(aux['loss']):.4f}", flush=True)
N = 10
t0 = time.perf_counter()
for i in range(N):
    params, opt_state, aux = step(params, opt_state, batch, lr, key, i + 1)
last = float(aux["loss"])
dt = (time.perf_counter() - t0) / N
print(f"[{mode}/{variant}] steady: {dt*1e3:.1f} ms/step "
      f"({B/dt:.1f} utts/s) loss={last:.4f}", flush=True)
