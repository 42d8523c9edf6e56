"""Serve a frozen StableHLO artifact over HTTP with micro-batching.

Production serving entry point (no reference counterpart — the reference
decoded inside research scripts via ``sess.run``; SURVEY.md §1 "no serving
layer"). Loads an artifact produced by ``bin.export`` plus its ``.json``
serving contract and answers speech-recognition requests; concurrent
requests are micro-batched into the artifact's static batch shape by
``serving.MicroBatcher`` so the device always runs full fixed-shape
programs (one XLA executable, zero recompiles).

    python -m tensorflow_end2end_speech_recognition_tpu.bin.serve \
        /tmp/model.shlo [--host 0.0.0.0] [--port 8000] [--max-wait-ms 10]

API (batch artifacts):
  GET  /healthz    -> the serving contract (shapes, beam width, platforms)
  POST /recognize  -> body is either JSON ``{"audio": [floats...]}`` (or
                      ``{"features": [[...], ...]}`` for feature-mode
                      artifacts) or raw little-endian float32 PCM bytes
                      (Content-Type: application/octet-stream).
                      Response: ``{"ids": [...], "text": "..."}``; ``text``
                      is present when the artifact carries a unit inventory;
                      ``"truncated": true`` flags input longer than the
                      artifact's padded capacity.

API (streaming artifacts from ``bin.export --streaming``):
  POST /stream/start          -> {"session": id, "chunk_samples": C}
  POST /stream/audio?session= -> append audio, returns tokens emitted so far
  POST /stream/end?session=   -> flush remaining audio, final tokens

Error statuses: 400 malformed request / unknown session, 503 overload
(slots busy, inference timeout), 500 device-side failure.
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np


def _decode_text(ids, meta) -> str | None:
    units = meta.get("units")
    if not units:
        return None
    toks = [units[i] for i in ids if 0 <= i < len(units)]
    sep = "" if str(meta.get("label_type", "")).startswith("character") else " "
    return sep.join(toks)


class _BaseHandler(BaseHTTPRequestHandler):
    """Shared plumbing: JSON responses, /healthz, error-status mapping."""

    meta: dict = {}

    def log_message(self, *args):  # quiet; stdout is the server log
        pass

    def _json(self, code: int, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, e: Exception):
        # 4xx = the caller's fault; 503 = back off and retry; 500 = server bug
        # or device failure. Load balancers key health off this distinction.
        if isinstance(e, TimeoutError):
            code = 503
        elif isinstance(e, (ValueError, KeyError, TypeError, json.JSONDecodeError)):
            code = 400
        else:
            code = 500
        self._json(code, {"error": f"{type(e).__name__}: {e}"})

    def do_GET(self):
        if self.path == "/healthz":
            self._json(200, {"status": "ok", **self.meta})
        else:
            self._json(404, {"error": "unknown path"})

    def _read_audio(self, raw: bytes, json_keys=("audio",)) -> np.ndarray:
        ctype = self.headers.get("Content-Type", "application/json")
        if ctype.startswith("application/octet-stream"):
            return np.frombuffer(raw, np.float32)
        req = json.loads(raw)
        for k in json_keys:
            if k in req:
                return np.asarray(req[k], np.float32)
        raise ValueError(f"JSON body needs one of {json_keys}")


def make_server(artifact_path, host: str = "127.0.0.1", port: int = 0,
                max_wait_ms: float = 10.0, request_timeout_s: float = 60.0,
                warmup: bool = True,
                session_timeout_s: float = 300.0) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``.server_address`` has the
    bound port. Caller runs ``serve_forever()`` and should call
    ``.batcher.stop()`` on shutdown.

    ``warmup`` dispatches one zero batch before the server accepts traffic,
    so no client request ever pays the artifact's first-dispatch compile
    (minutes on a cold compile cache). Streaming artifacts (from
    ``bin.export --streaming``) get the session API instead of /recognize;
    ``session_timeout_s`` reclaims slots abandoned without /stream/end.
    """
    artifact_path = Path(artifact_path)
    meta = json.loads(
        artifact_path.with_suffix(artifact_path.suffix + ".json").read_text()
    )
    if meta.get("streaming"):
        return _make_stream_server(artifact_path, meta, host, port, warmup,
                                   max_wait_ms, request_timeout_s,
                                   session_timeout_s)

    from ..serving import MicroBatcher, load_exported

    infer = load_exported(artifact_path)
    num = meta["num_samples"]
    row_shape = (num,) if meta.get("input_rank", 2) == 2 else tuple(
        [num, meta["feature_dim"]]
    )
    if warmup:
        import time as _time

        t0 = _time.perf_counter()
        zeros = np.zeros((meta["batch_size"],) + row_shape, np.float32)
        _, n = infer(zeros, np.zeros((meta["batch_size"],), np.int32))
        float(np.asarray(n).sum())  # sync (block_until_ready unreliable here)
        print(f"warmup: compiled + ran in {_time.perf_counter() - t0:.1f} s",
              flush=True)
    batcher = MicroBatcher(infer, meta["batch_size"], row_shape, max_wait_ms)

    class Handler(_BaseHandler):
        def do_POST(self):
            if self.path != "/recognize":
                self._json(404, {"error": "unknown path"})
                return
            try:
                raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                audio = self._read_audio(raw, ("audio", "features"))
                if audio.ndim != len(row_shape):
                    raise ValueError(
                        f"input rank {audio.ndim} != artifact rank {len(row_shape)}"
                    )
                n = min(audio.shape[0], num)
                row = np.zeros(row_shape, np.float32)
                row[:n] = audio[:n]
                ids, out_len = batcher.submit(row, n, timeout=request_timeout_s)
                ids = [int(i) for i in ids[:out_len]]
                resp = {"ids": ids, "num_ids": out_len}
                if audio.shape[0] > num:  # input exceeded padded capacity
                    resp["truncated"] = True
                    resp["consumed"] = n
                text = _decode_text(ids, meta)
                if text is not None:
                    resp["text"] = text
                self._json(200, resp)
            except Exception as e:  # noqa: BLE001 — mapped to 400/503/500
                self._error(e)

    Handler.meta = meta
    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher
    server.meta = meta
    return server


def _make_stream_server(artifact_path, meta, host, port, warmup,
                        max_wait_ms, request_timeout_s,
                        session_timeout_s) -> ThreadingHTTPServer:
    """Session API over a frozen streaming artifact (``StreamingEngine``)."""
    from ..serving import StreamingEngine, load_streaming

    state0, step, finalize = load_streaming(artifact_path)
    chunk = meta["chunk_samples"]
    b = meta["batch_size"]
    if warmup:
        import time as _time

        t0 = _time.perf_counter()
        _, _, n = step(state0, np.zeros((b, chunk), np.float32),
                       np.zeros((b,), np.int32))
        float(np.asarray(n).sum())
        if finalize is not None:  # pre-compile the beam finalize too
            _, fl, _ = finalize(state0)
            float(np.asarray(fl).sum())
        print(f"warmup: compiled + ran in {_time.perf_counter() - t0:.1f} s",
              flush=True)
    engine = StreamingEngine(state0, step, b, chunk, tick_ms=max_wait_ms,
                             session_timeout_s=session_timeout_s,
                             finalize=finalize,
                             final_flush=bool(meta.get("final_flush")))

    class Handler(_BaseHandler):
        def _tokens_resp(self, toks):
            resp = {"ids": toks}
            text = _decode_text(toks, meta)
            if text is not None:
                resp["text"] = text
            return resp

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            try:
                url = urlparse(self.path)
                raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                if url.path == "/stream/start":
                    sid = engine.start()
                    if sid is None:
                        self._json(503, {"error": "all slots busy"})
                    else:
                        self._json(200, {"session": sid,
                                         "chunk_samples": chunk})
                    return
                sid = parse_qs(url.query).get("session", [None])[0]
                if sid is None:
                    raise ValueError("missing ?session= parameter")
                if url.path == "/stream/audio":
                    audio = self._read_audio(raw)
                    self._json(200, self._tokens_resp(engine.feed(sid, audio)))
                elif url.path == "/stream/end":
                    resp = self._tokens_resp(engine.end(sid, request_timeout_s))
                    if finalize is not None:
                        # beam artifact: these ids are the COMPLETE final
                        # transcript, superseding the live greedy partials
                        resp["final"] = True
                    self._json(200, resp)
                else:
                    self._json(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001 — mapped to 400/503/500
                self._error(e)

    Handler.meta = meta
    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = engine  # uniform shutdown handle (.stop())
    server.meta = meta
    return server


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifact")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--request-timeout-s", type=float, default=60.0)
    ap.add_argument("--session-timeout-s", type=float, default=300.0,
                    help="reclaim streaming slots abandoned without /stream/end")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args(argv)

    from ..utils.jax_setup import setup

    setup()
    server = make_server(args.artifact, args.host, args.port, args.max_wait_ms,
                         args.request_timeout_s, warmup=not args.no_warmup,
                         session_timeout_s=args.session_timeout_s)
    host, port = server.server_address[:2]
    m = server.meta
    kind = (f"streaming, chunk {m['chunk_samples']}" if m.get("streaming")
            else f"beam {m['beam_width']}")
    print(f"serving {args.artifact} on http://{host}:{port}  "
          f"(batch {m['batch_size']}, {kind}, platforms {m['platforms']})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.batcher.stop()


if __name__ == "__main__":
    main()
