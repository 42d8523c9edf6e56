"""HTTP serving runtime: micro-batching server over a frozen artifact."""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
from tensorflow_end2end_speech_recognition_tpu.models.ctc import CTCConfig
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig
from tensorflow_end2end_speech_recognition_tpu.serving import (
    MicroBatcher,
    build_inference_fn,
    export_model,
)
from tensorflow_end2end_speech_recognition_tpu.train import ctc_task


class _Units:
    units = ["aa", "bb", "cc", "dd", "ee", "ff"]


def _export_tiny(tmp_path, batch=3, num=4096):
    task = ctc_task.CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="blstm", num_units=8, num_layers=1),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False),
    )
    params = ctc_task.init_params(jax.random.PRNGKey(0), task)
    out = export_model(
        task, ctc_task, params, tmp_path / "m.shlo", batch, num,
        tokenizer=_Units(), extra_meta={"label_type": "phone61"},
    )
    return task, params, out


def test_micro_batcher_partial_and_full_batches(tmp_path):
    task, params, out = _export_tiny(tmp_path)
    direct = build_inference_fn(task, ctc_task, params)
    rng = np.random.RandomState(0)
    waves = rng.randn(5, 4096).astype(np.float32) * 0.1
    lens = np.asarray([4096, 2048, 4096, 3000, 4096], np.int32)

    from tensorflow_end2end_speech_recognition_tpu.serving import load_exported

    batcher = MicroBatcher(load_exported(out), 3, (4096,), max_wait_ms=50.0)
    try:
        # 5 concurrent requests against batch_size=3: one full + one partial batch
        results = [None] * 5
        def worker(i):
            results[i] = batcher.submit(waves[i], int(lens[i]))
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # each row must equal the direct single-utterance result
        for i in range(5):
            one_ids, one_len = (
                np.asarray(x)
                for x in direct(
                    jnp.asarray(np.tile(waves[i], (3, 1))),
                    jnp.asarray(np.full((3,), lens[i], np.int32)),
                )
            )
            got_ids, got_n = results[i]
            assert got_n == int(one_len[0])
            np.testing.assert_array_equal(got_ids, one_ids[0])
    finally:
        batcher.stop()


def test_http_server_end_to_end(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.bin.serve import make_server

    task, params, out = _export_tiny(tmp_path)
    direct = build_inference_fn(task, ctc_task, params)
    server = make_server(out, port=0, max_wait_ms=5.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok" and health["batch_size"] == 3

        rng = np.random.RandomState(1)
        wav = (rng.randn(3000) * 0.1).astype(np.float32)
        # JSON request
        conn.request(
            "POST", "/recognize", json.dumps({"audio": wav.tolist()}),
            {"Content-Type": "application/json"},
        )
        r1 = json.loads(conn.getresponse().read())
        # raw float32 request (identical audio -> identical answer)
        conn.request(
            "POST", "/recognize", wav.tobytes(),
            {"Content-Type": "application/octet-stream"},
        )
        r2 = json.loads(conn.getresponse().read())
        assert r1 == r2
        want_ids, want_len = (
            np.asarray(x)
            for x in direct(
                jnp.asarray(np.tile(np.pad(wav, (0, 4096 - 3000)), (3, 1))),
                jnp.asarray(np.full((3,), 3000, np.int32)),
            )
        )
        assert r1["num_ids"] == int(want_len[0])
        assert r1["ids"] == [int(i) for i in want_ids[0][: int(want_len[0])]]
        units = _Units.units
        assert r1["text"] == " ".join(units[i] for i in r1["ids"] if 0 <= i < 6)

        # malformed request -> 400 with an error body, server stays up
        conn.request(
            "POST", "/recognize", json.dumps({"audio": [[1.0], [2.0]]}),
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 400 and "error" in json.loads(resp.read())
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["status"] == "ok"
    finally:
        server.shutdown()
        server.batcher.stop()


def test_http_streaming_sessions(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.bin.serve import make_server
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.serving import export_streaming_model

    task = ctc_task.CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="lstm", num_units=8, num_layers=1),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False, cmvn="none"),
    )
    params = ctc_task.init_params(jax.random.PRNGKey(3), task)
    chunk = 1600
    out = export_streaming_model(
        task, params, tmp_path / "s.shlo", 2, chunk, tokenizer=_Units(),
        extra_meta={"label_type": "phone61"},
    )

    # ground truth via the in-process streaming path
    from tensorflow_end2end_speech_recognition_tpu.streaming import build_streaming_fn

    rng = np.random.RandomState(4)
    wavs = [
        (rng.randn(3 * chunk + 700) * 0.3).astype(np.float32),  # partial tail
        (rng.randn(2 * chunk) * 0.3).astype(np.float32),  # exact boundary
    ]
    want = []
    init_fn, step_fn = build_streaming_fn(task, params, chunk)
    for w in wavs:
        state = init_fn(1)
        toks = []
        n_ch = -(-len(w) // chunk)
        pad = np.pad(w, (0, n_ch * chunk - len(w)))
        for k in range(n_ch):
            cl = np.clip(len(w) - k * chunk, 0, chunk)
            state, t, n = step_fn(
                state, jnp.asarray(pad[None, k * chunk : (k + 1) * chunk]),
                jnp.asarray([cl], np.int32),
            )
            toks.extend(np.asarray(t)[0, : int(np.asarray(n)[0])].tolist())
        want.append(toks)

    server = make_server(out, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conns = [http.client.HTTPConnection("127.0.0.1", port, timeout=60)
                 for _ in range(2)]
        sids = []
        for c in conns:
            c.request("POST", "/stream/start", b"")
            r = json.loads(c.getresponse().read())
            assert r["chunk_samples"] == chunk
            sids.append(r["session"])
        # a third session must be rejected: both slots busy
        conns[0].request("POST", "/stream/start", b"")
        assert conns[0].getresponse().status == 503

        got = [[], []]
        # interleave: session 0 sends thirds, session 1 sends halves
        import time as _t

        for part in np.array_split(wavs[0], 3):
            conns[0].request("POST", "/stream/audio?session=" + sids[0],
                             part.astype(np.float32).tobytes(),
                             {"Content-Type": "application/octet-stream"})
            got[0].extend(json.loads(conns[0].getresponse().read())["ids"])
        for part in np.array_split(wavs[1], 2):
            conns[1].request("POST", "/stream/audio?session=" + sids[1],
                             part.astype(np.float32).tobytes(),
                             {"Content-Type": "application/octet-stream"})
            got[1].extend(json.loads(conns[1].getresponse().read())["ids"])
        for i, c in enumerate(conns):
            c.request("POST", "/stream/end?session=" + sids[i], b"")
            r = json.loads(c.getresponse().read())
            got[i].extend(r["ids"])
        assert got[0] == want[0]
        assert got[1] == want[1]

        # freed slots: a new session starts fine and decodes wav[1] again
        conns[0].request("POST", "/stream/start", b"")
        sid = json.loads(conns[0].getresponse().read())["session"]
        conns[0].request("POST", "/stream/audio?session=" + sid,
                         wavs[1].tobytes(),
                         {"Content-Type": "application/octet-stream"})
        toks = json.loads(conns[0].getresponse().read())["ids"]
        _t.sleep(0.3)  # let the worker drain the buffered chunks
        conns[0].request("POST", "/stream/audio?session=" + sid, b"",
                         {"Content-Type": "application/octet-stream"})
        toks += json.loads(conns[0].getresponse().read())["ids"]
        conns[0].request("POST", "/stream/end?session=" + sid, b"")
        toks += json.loads(conns[0].getresponse().read())["ids"]
        assert toks == want[1]
    finally:
        server.shutdown()
        server.batcher.stop()


def test_streaming_engine_surfaces_device_errors():
    from tensorflow_end2end_speech_recognition_tpu.serving import StreamingEngine

    calls = {"n": 0}

    def bad_step(state, chunk, lens):
        calls["n"] += 1
        raise RuntimeError("device fell over")

    eng = StreamingEngine([np.zeros((2, 4))], bad_step, 2, 1600, tick_ms=1.0)
    try:
        sid = eng.start()
        eng.feed(sid, np.zeros((1600,), np.float32))
        import pytest, time as _t

        _t.sleep(0.3)  # let the worker hit the error
        with pytest.raises(RuntimeError, match="fell over"):
            eng.feed(sid, np.zeros((1,), np.float32))
        # a fresh session on the freed... slot is still allocated; end() also raises
        with pytest.raises(RuntimeError, match="fell over"):
            eng.end(sid, timeout=5.0)
        # the worker survived: another session's start still works
        assert eng.start() is not None
        assert calls["n"] >= 1
    finally:
        eng.stop()


def test_http_truncation_flag(tmp_path):
    from tensorflow_end2end_speech_recognition_tpu.bin.serve import make_server

    task, params, out = _export_tiny(tmp_path)
    server = make_server(out, port=0, max_wait_ms=5.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        wav = np.zeros(5000, np.float32)  # longer than the 4096 capacity
        conn.request("POST", "/recognize", wav.tobytes(),
                     {"Content-Type": "application/octet-stream"})
        r = json.loads(conn.getresponse().read())
        assert r["truncated"] is True and r["consumed"] == 4096
    finally:
        server.shutdown()
        server.batcher.stop()


def test_streaming_engine_reclaims_abandoned_sessions():
    from tensorflow_end2end_speech_recognition_tpu.serving import StreamingEngine

    def idle_step(state, chunk, lens):
        return state, np.full((1, 4), -1, np.int32), np.zeros((1,), np.int32)

    eng = StreamingEngine([np.zeros((1, 4))], idle_step, 1, 1600,
                          tick_ms=1.0, session_timeout_s=0.2)
    try:
        import pytest, time as _t

        sid = eng.start()
        assert eng.start() is None  # single slot busy
        _t.sleep(0.5)  # abandoned: no feed, no end
        sid2 = eng.start()  # reclaimed
        assert sid2 is not None
        with pytest.raises(KeyError):
            eng.feed(sid, np.zeros((1,), np.float32))
    finally:
        eng.stop()


def test_streaming_engine_flush_timeout_frees_slot():
    """A hung device step must not leak the slot when end() times out
    (ADVICE r2 #1: ending slots skipped idle reclaim forever)."""
    import pytest
    from tensorflow_end2end_speech_recognition_tpu.serving import StreamingEngine

    release = threading.Event()

    def hung_step(state, chunk, lens):
        release.wait(10.0)  # simulates a wedged device dispatch
        return state, np.full((1, 4), -1, np.int32), np.zeros((1,), np.int32)

    eng = StreamingEngine([np.zeros((1, 4))], hung_step, 1, 16, tick_ms=1.0)
    try:
        sid = eng.start()
        eng.feed(sid, np.zeros((16,), np.float32))  # worker blocks in hung_step
        with pytest.raises(TimeoutError):
            eng.end(sid, timeout=0.3)
        # the slot was freed despite the timed-out flush
        assert eng.start() is not None
    finally:
        release.set()
        eng.stop()


def test_http_streaming_beam_sessions(tmp_path):
    """Live sessions over a frozen streaming-BEAM artifact: /stream/end
    returns the final beam transcript equal to the offline prefix beam
    (VERDICT r2 #1/#3)."""
    from tensorflow_end2end_speech_recognition_tpu.bin.serve import make_server
    from tensorflow_end2end_speech_recognition_tpu.decoding import (
        ctc_prefix_beam_search,
    )
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.models.ctc import apply_ctc
    from tensorflow_end2end_speech_recognition_tpu.serving import export_streaming_model
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import device_pipeline

    task = ctc_task.CTCTaskConfig(
        model=CTCConfig(
            encoder=EncoderConfig(encoder_type="lstm", num_units=8, num_layers=1),
            num_classes=6,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False, cmvn="none"),
    )
    params = ctc_task.init_params(jax.random.PRNGKey(5), task)
    chunk, W, K, L = 1600, 4, 5, 40
    out = export_streaming_model(
        task, params, tmp_path / "sb.shlo", 2, chunk, tokenizer=_Units(),
        extra_meta={"label_type": "phone61"},
        beam_width=W, top_k_classes=K, max_prefix_len=L,
    )

    rng = np.random.RandomState(6)
    wavs = [
        (rng.randn(3 * chunk + 700) * 0.3).astype(np.float32),  # partial tail
        (rng.randn(2 * chunk) * 0.3).astype(np.float32),  # exact boundary
    ]
    want = []
    for w in wavs:
        feats, fl = device_pipeline(
            task,
            {"inputs": jnp.asarray(w[None]),
             "input_len": jnp.asarray([len(w)], np.int32)},
        )
        o = apply_ctc(params, task.model, feats, fl)
        p, l, _ = ctc_prefix_beam_search(
            o.logits, o.logit_len, task.model.blank_id,
            beam_width=W, top_k_classes=K, max_prefix_len=L,
        )
        want.append(np.asarray(p)[0, 0, : int(np.asarray(l)[0, 0])].tolist())

    server = make_server(out, port=0)
    assert server.meta["beam_width"] == W
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conns = [http.client.HTTPConnection("127.0.0.1", port, timeout=60)
                 for _ in range(2)]
        sids = []
        for c in conns:
            c.request("POST", "/stream/start", b"")
            sids.append(json.loads(c.getresponse().read())["session"])
        for i, c in enumerate(conns):
            c.request("POST", "/stream/audio?session=" + sids[i],
                      wavs[i].tobytes(),
                      {"Content-Type": "application/octet-stream"})
            json.loads(c.getresponse().read())
        for i, c in enumerate(conns):
            c.request("POST", "/stream/end?session=" + sids[i], b"")
            r = json.loads(c.getresponse().read())
            assert r.get("final") is True
            assert r["ids"] == want[i], f"session {i}"
    finally:
        server.shutdown()
        server.batcher.stop()


def test_http_streaming_sessions_transducer(tmp_path):
    """Live HTTP sessions over a frozen TRANSDUCER streaming artifact emit
    the in-process chunked tokens (the session runtime is decode-agnostic)."""
    from tensorflow_end2end_speech_recognition_tpu.bin.serve import make_server
    from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig
    from tensorflow_end2end_speech_recognition_tpu.models.transducer import (
        TransducerConfig,
    )
    from tensorflow_end2end_speech_recognition_tpu.serving import export_streaming_model
    from tensorflow_end2end_speech_recognition_tpu.streaming import build_streaming_fn
    from tensorflow_end2end_speech_recognition_tpu.train import transducer_task

    task = transducer_task.TransducerTaskConfig(
        model=TransducerConfig(
            encoder=EncoderConfig(encoder_type="lstm", num_units=8, num_layers=1),
            num_classes=6, pred_num_units=8, embedding_dim=4, joint_dim=8,
            max_symbols_per_frame=2,
        ),
        frontend=FrontendConfig(add_deltas=False, use_energy=False, cmvn="none"),
    )
    params = transducer_task.init_params(jax.random.PRNGKey(6), task)
    chunk = 1600
    out = export_streaming_model(
        task, params, tmp_path / "t.shlo", 2, chunk, tokenizer=_Units(),
        extra_meta={"label_type": "phone61"},
    )

    rng = np.random.RandomState(7)
    wav = (rng.randn(2 * chunk + 700) * 0.3).astype(np.float32)
    init_fn, step_fn = build_streaming_fn(task, params, chunk)
    state = init_fn(1)
    want = []
    n_ch = -(-len(wav) // chunk)
    pad = np.pad(wav, (0, n_ch * chunk - len(wav)))
    for k in range(n_ch):
        cl = np.clip(len(wav) - k * chunk, 0, chunk)
        state, t, n = step_fn(
            state, jnp.asarray(pad[None, k * chunk : (k + 1) * chunk]),
            jnp.asarray([cl], np.int32),
        )
        want.extend(np.asarray(t)[0, : int(np.asarray(n)[0])].tolist())

    server = make_server(out, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        c.request("POST", "/stream/start", b"")
        sid = json.loads(c.getresponse().read())["session"]
        got = []
        for part in np.array_split(wav, 3):
            c.request("POST", "/stream/audio?session=" + sid,
                      part.astype(np.float32).tobytes(),
                      {"Content-Type": "application/octet-stream"})
            got.extend(json.loads(c.getresponse().read())["ids"])
        c.request("POST", "/stream/end?session=" + sid, b"")
        got.extend(json.loads(c.getresponse().read())["ids"])
        assert got == want
    finally:
        server.shutdown()
        server.batcher.stop()
