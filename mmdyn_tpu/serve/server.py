"""Minimal production serving loop: HTTP endpoints over an InferenceSession.

Stdlib-only (http.server); the model math runs through the AOT-compiled
predictor at a fixed batch size — requests are padded up to it and truncated
on the way out, so the serving hot path never traces or recompiles.

Endpoints (wire format: .npz bodies — `np.savez` on the client,
`np.load` here; metadata via query string):

    GET  /healthz             -> JSON: model/problem/batch configuration
    POST /predict[?sample=1]  -> npz in  (visual/tactile/pose [, condition])
                                 npz out (predictions + mu/logvar)
    POST /rollout?steps=N     -> npz in (batch-1 initial state)
                                 npz out ((N, 1, ...) trajectories)

Images travel as uint8 in both directions (quantized on device on the way
out — see docs/PARITY.md serving table for why payload bytes dominate
round-trip latency through the tunnel).

The reference has no serving story at all; this is the smallest honest one:
single worker (one chip, in-order execution), fixed shapes, zero deps.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def _npz_bytes(arrays: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


class ServingApp:
    """Request -> prediction glue; separable from HTTP for testing."""

    def __init__(self, session, batch_size: int = 64):
        self.session = session
        self.batch_size = int(batch_size)
        self.cfg = session.cfg
        self.modalities = (["visual", "tactile"] if self.cfg.cross_modal
                           else [self.cfg.input_type])
        if self.cfg.use_pose:
            self.modalities.append("pose")
        self._lock = threading.Lock()   # one chip: serialize compute
        self._requests = 0
        # warm the AOT cache for the serving batch size
        session.aot_predict(self.batch_size, tuple(self.modalities),
                            conditional=self.cfg.conditional,
                            uint8_images=self.cfg.problem_type != "regression")

    # -- helpers ---------------------------------------------------------
    def health(self) -> dict:
        import dataclasses

        return {
            "status": "ok",
            "model": self.cfg.model_name,
            "problem_type": self.cfg.problem_type,
            "modalities": self.modalities,
            "batch_size": self.batch_size,
            "conditional": self.cfg.conditional,
            "requests_served": self._requests,
            "config": dataclasses.asdict(self.cfg),
        }

    def _parse_inputs(self, npz) -> tuple[dict, np.ndarray | None, int]:
        inputs = {}
        n = None
        for m in self.modalities:
            if m not in npz:
                continue
            arr = np.asarray(npz[m])
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            else:
                arr = arr.astype(np.float32)
            inputs[m] = arr
            n = arr.shape[0] if n is None else n
            if arr.shape[0] != n:
                raise ValueError("modalities disagree on batch size")
        if not inputs:
            raise ValueError(f"need at least one of {self.modalities}")
        cond = None
        if "condition" in npz:
            if not self.cfg.conditional:
                raise ValueError("model is not conditional")
            cond = np.asarray(npz["condition"], np.float32)
        return inputs, cond, n

    def _pad(self, arr: np.ndarray, to: int) -> np.ndarray:
        n = arr.shape[0]
        if n == to:
            return arr
        return np.concatenate([arr, np.repeat(arr[-1:], to - n, axis=0)])

    # -- endpoints -------------------------------------------------------
    def predict(self, body: bytes, sample: bool = False) -> bytes:
        npz = np.load(io.BytesIO(body), allow_pickle=False)
        inputs, cond, n = self._parse_inputs(npz)
        if n > self.batch_size:
            raise ValueError(f"batch {n} exceeds serving batch size "
                             f"{self.batch_size}")
        import jax

        inputs = {m: self._pad(a, self.batch_size)
                  for m, a in inputs.items()}
        if cond is not None:
            cond = self._pad(cond, self.batch_size)
        with self._lock:
            out = self.session.predict(
                **inputs, condition=cond, sample=sample,
                uint8_images=self.cfg.problem_type != "regression")
            out = jax.device_get(out)
            self._requests += 1
        return _npz_bytes({k: np.asarray(v)[:n] for k, v in out.items()})

    def rollout(self, body: bytes, steps: int, sample: bool = False) -> bytes:
        npz = np.load(io.BytesIO(body), allow_pickle=False)
        inputs, cond, n = self._parse_inputs(npz)
        if n != 1:
            raise ValueError("rollout serves batch-1 initial states")
        import jax

        with self._lock:
            traj = self.session.rollout(int(steps), **inputs, condition=cond,
                                        sample=sample)
            traj = jax.device_get(traj)
            self._requests += 1
        return _npz_bytes({k: np.asarray(v) for k, v in traj.items()})


class _Handler(BaseHTTPRequestHandler):
    app: ServingApp = None  # set by make_server

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, code: int, obj: dict):
        self._reply(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):
        if urlparse(self.path).path == "/healthz":
            self._reply_json(200, self.app.health())
        else:
            self._reply_json(404, {"error": "unknown path"})

    def do_POST(self):
        url = urlparse(self.path)
        q = parse_qs(url.query)
        sample = q.get("sample", ["0"])[0] == "1"
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        try:
            if url.path == "/predict":
                out = self.app.predict(body, sample=sample)
            elif url.path == "/rollout":
                steps = int(q.get("steps", ["10"])[0])
                out = self.app.rollout(body, steps, sample=sample)
            else:
                return self._reply_json(404, {"error": "unknown path"})
        except ValueError as e:
            return self._reply_json(400, {"error": str(e)})
        self._reply(200, out, "application/x-npz")


def make_server(session, host: str = "127.0.0.1", port: int = 8471,
                batch_size: int = 64) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; .serve_forever() to run."""
    app = ServingApp(session, batch_size=batch_size)
    handler = type("Handler", (_Handler,), {"app": app})
    return ThreadingHTTPServer((host, port), handler)
