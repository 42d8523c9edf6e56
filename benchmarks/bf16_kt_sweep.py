"""kt re-tune + batch-admission probe for the bf16-stream Pallas LSTM path.

The kt time-block sizes and the ``pallas_fits`` row bound are anchored at
the f32 scoped-VMEM footprint (B=32 H=512; ``_ANCHOR_ROWS``). The bf16
stream path (round 5) halves the per-block stream bytes, so two upgrades
become plausible and must be measured, smallest-first, with health checks
(scoped-VMEM overflow hard-crashes the remote compile helper — CLAUDE.md):

  1. larger kt at B=128 (the headline batch): f32 scaling gives the bidi
     kernels kt=1 there; bf16 streams may afford kt=2.
  2. B=256 admission: f32 routes b*h > 4*_ANCHOR_ROWS to the scan; bf16
     streams may fit the backward at kt=1.

Usage:  python benchmarks/bf16_kt_sweep.py [B] [T]   (default 128 400)
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

import tensorflow_end2end_speech_recognition_tpu.ops.pallas.lstm_kernel as lk  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T = int(sys.argv[2]) if len(sys.argv) > 2 else 400
H, D = 512, 1024

rng = np.random.RandomState(0)
# bf16 xproj streams: the kernels take their stream dtype from xproj
xf = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.05).astype(jnp.bfloat16)
xb = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.05).astype(jnp.bfloat16)
whf = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
whb = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
mask = jnp.ones((B, T), jnp.float32)


def health(tag):
    x = jnp.ones((256, 256))
    print(f"  health[{tag}]: {float(jnp.sum(x @ x)):.0f}", flush=True)


def measure(n=20):
    fwd = jax.jit(lambda a, b, c, d, m: jnp.sum(
        lk.lstm_bidi_pallas(a, b, c, d, m)[0].astype(jnp.float32)))
    g = jax.jit(lambda a, b, c, d, m: sum(
        jnp.sum(jnp.abs(v.astype(jnp.float32)))
        for v in jax.grad(
            lambda a_, b_, c_, d_: (lambda yf, yb: jnp.sum(yf.astype(jnp.float32) ** 2)
                                    + jnp.sum(yb.astype(jnp.float32) ** 2))(
                *lk.lstm_bidi_pallas(a_, b_, c_, d_, m)),
            argnums=(0, 1, 2, 3))(a, b, c, d)
    ))
    float(fwd(xf, xb, whf, whb, mask)); float(g(xf, xb, whf, whb, mask))
    t0 = time.perf_counter()
    for _ in range(n):
        s = fwd(xf, xb, whf, whb, mask)
    float(s)
    f_ms = (time.perf_counter() - t0) / n * 1e3
    t0 = time.perf_counter()
    for _ in range(n):
        s = g(xf, xb, whf, whb, mask)
    float(s)
    fb_ms = (time.perf_counter() - t0) / n * 1e3
    return f_ms, fb_ms


cur_f = lk._scale_kt(lk._BLOCK_T_BIDI, T, B, H)
cur_b = lk._scale_kt(lk._BLOCK_T_BIDI_BWD, T, B, H)
print(f"B={B} T={T} H={H} bf16 streams: current kt fwd={cur_f} bwd={cur_b}",
      flush=True)
health("pre")

orig = (lk._scale_kt, lk._BLOCK_T_BIDI, lk._BLOCK_T_BIDI_BWD)
results = []
# smallest-first; each step up is the risky point — stop escalating a
# dimension once it fails
for ktf, ktb in sorted({(cur_f, cur_b),
                        (min(2 * cur_f, T), cur_b),
                        (min(2 * cur_f, T), min(2 * cur_b, T)),
                        (min(4 * cur_f, T), min(2 * cur_b, T))}):
    lk._scale_kt = lambda base, t, b, h: max(1, min(base, t))
    lk._BLOCK_T_BIDI, lk._BLOCK_T_BIDI_BWD = ktf, ktb
    try:
        f_ms, fb_ms = measure()
        print(f"kt=({ktf},{ktb}): fwd {f_ms:7.2f} ms  fwd+bwd {fb_ms:7.2f} ms",
              flush=True)
        results.append((ktf, ktb, f_ms, fb_ms))
    except Exception as e:  # noqa: BLE001
        print(f"kt=({ktf},{ktb}): FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        lk._scale_kt, lk._BLOCK_T_BIDI, lk._BLOCK_T_BIDI_BWD = orig
        health(f"post-fail kt=({ktf},{ktb})")
        break
    finally:
        lk._scale_kt, lk._BLOCK_T_BIDI, lk._BLOCK_T_BIDI_BWD = orig
    health(f"post kt=({ktf},{ktb})")

if results:
    best = min(results, key=lambda r: r[3])
    print(f"best fwd+bwd: kt=({best[0]},{best[1]}) {best[3]:.2f} ms "
          f"(current ({cur_f},{cur_b}))", flush=True)
