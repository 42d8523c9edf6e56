"""Measure the TF1-CPU reference baseline for the headline metric.

BASELINE.md's throughput target is >=5x "the TF1-CPU-baseline
utterances/sec/chip" for LibriSpeech-960-shape BLSTM-CTC training; the
reference's ``tf.nn.ctc_loss`` ran on CPU even with a GPU (SURVEY.md §2.8),
and this environment has no GPU, so the faithful denominator is a TF1-style
graph-mode session step on CPU at the reference's shapes:

    5-layer BLSTM-512, 360-dim stacked inputs (LS config: 40 fbank +d +dd,
    3/3 frame stacking), tf.compat.v1.nn.ctc_loss + Adam, batch 32, T=400.

Keras 3 removed ``tf.compat.v1.nn.rnn_cell``, so the LSTM is hand-rolled in
graph mode with ``tf.scan`` (a per-step fused-gate matmul inside a while
loop — the same execution shape as the reference's LSTMCell dynamic_rnn
path). This mirrors the reference call stack (SURVEY.md §3.1) without
copying its code. Result is cached to tf1_cpu_baseline.json for bench.py's
``vs_baseline`` field.

Usage: python benchmarks/tf1_cpu_baseline.py [--steps N]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--input-dim", type=int, default=360)
    ap.add_argument("--units", type=int, default=512)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--classes", type=int, default=28)
    args = ap.parse_args()

    import tensorflow as tf

    tf1 = tf.compat.v1
    tf1.disable_eager_execution()

    b, t, d, units = args.batch, args.frames, args.input_dim, args.units
    rng = np.random.RandomState(0)
    feats = rng.randn(b, t, d).astype(np.float32)
    seq_len = np.full((b,), t, np.int32)
    label_len = 40
    labels_dense = rng.randint(0, args.classes, (b, label_len))
    idxs = np.array([[i, j] for i in range(b) for j in range(label_len)], np.int64)
    vals = labels_dense.reshape(-1).astype(np.int32)

    def lstm_scan(x_tm, din, name):
        """Time-major unidirectional LSTM via tf.scan (TF1 dynamic_rnn shape)."""
        with tf1.variable_scope(name):
            w = tf1.get_variable("w", [din + units, 4 * units], tf.float32,
                                 tf1.random_uniform_initializer(-0.1, 0.1))
            bias = tf1.get_variable("b", [4 * units], tf.float32,
                                    tf1.zeros_initializer())

        def step(carry, x_t):
            h, c = carry
            gates = tf.matmul(tf.concat([x_t, h], 1), w) + bias
            i, f, g, o = tf.split(gates, 4, axis=1)
            c = tf.sigmoid(f + 1.0) * c + tf.sigmoid(i) * tf.tanh(g)
            h = tf.sigmoid(o) * tf.tanh(c)
            return (h, c)

        init = (tf.zeros([b, units]), tf.zeros([b, units]))
        hs, _ = tf.scan(step, x_tm, initializer=init)
        return hs  # [T, B, units]

    graph = tf1.Graph()
    with graph.as_default():
        inputs = tf1.placeholder(tf.float32, [b, t, d])
        seq_len_pl = tf1.placeholder(tf.int32, [b])
        labels_pl = tf1.sparse_placeholder(tf.int32)
        x = tf.transpose(inputs, [1, 0, 2])  # time-major
        din = d
        for layer in range(args.layers):
            fw = lstm_scan(x, din, f"l{layer}_fw")
            bw = tf.reverse(lstm_scan(tf.reverse(x, [0]), din, f"l{layer}_bw"), [0])
            x = tf.concat([fw, bw], axis=-1)
            din = 2 * units
        wo = tf1.get_variable("out_w", [din, args.classes + 1], tf.float32,
                              tf1.random_uniform_initializer(-0.1, 0.1))
        bo = tf1.get_variable("out_b", [args.classes + 1], tf.float32,
                              tf1.zeros_initializer())
        logits_tm = tf.einsum("tbd,dc->tbc", x, wo) + bo
        loss = tf.reduce_mean(
            tf1.nn.ctc_loss(labels_pl, logits_tm, seq_len_pl, time_major=True)
        )
        train_op = tf1.train.AdamOptimizer(1e-3).minimize(loss)

        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            feed = {
                inputs: feats,
                seq_len_pl: seq_len,
                labels_pl: tf1.SparseTensorValue(idxs, vals, (b, label_len)),
            }
            sess.run([train_op, loss], feed)  # warmup
            t0 = time.perf_counter()
            for _ in range(args.steps):
                _, l = sess.run([train_op, loss], feed)
            dt = (time.perf_counter() - t0) / args.steps
    utts_per_sec = b / dt
    out = {
        "metric": "tf1_cpu_utterances_per_sec",
        "value": utts_per_sec,
        "sec_per_step": dt,
        "batch": b,
        "frames": t,
        "input_dim": d,
        "loss": float(l),
    }
    path = Path(__file__).parent / "tf1_cpu_baseline.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
