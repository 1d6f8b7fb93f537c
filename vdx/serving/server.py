"""Generation service + HTTP server — the production-serving surface.

The reference is a research harness with no serving story; a production
framework needs one (BASELINE.json north star: "intended for large-scale
production deployment and serving"). Design:

  * :class:`GenerationService` — thread-safe wrapper around a pipeline:
    single-flight device execution (XLA programs are serialized per chip
    anyway), compiled-executable reuse across requests (shape-keyed cache
    lives in the pipeline), request/latency accounting.
  * :class:`GenerationServer` — stdlib http.server JSON API:
      POST /generate {prompt, negative_prompt?, num_frames?, steps?,
                      guidance_scale?, height?, width?, seed?}
        -> {frames: [base64 PNG, ...], timings: {...}}
      GET /healthz -> {status, device, requests_served}

No external web framework — zero-dependency stdlib, matching the bare-image
constraint. Multi-chip scale-out = one server process per chip/slice behind
any HTTP load balancer; in-process batching rides vdx/harness/batched.py.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class GenerationService:
    def __init__(self, pipe, defaults: Optional[dict] = None):
        self.pipe = pipe
        self.defaults = {
            "num_frames": 16,
            "num_inference_steps": 25,
            "guidance_scale": 7.5,
            "height": 512,
            "width": 512,
            "negative_prompt": "bad quality, blurry, distorted",
            **(defaults or {}),
        }
        self._lock = threading.Lock()
        self.requests_served = 0
        self.total_seconds = 0.0

    def generate(self, request: dict) -> dict:
        prompt = request["prompt"]
        kwargs = {
            k: request.get(k, v)
            for k, v in self.defaults.items()
        }
        seed = int(request.get("seed", 0))
        t0 = time.time()
        with self._lock:  # one program on the chip at a time
            out = self.pipe(
                prompt,
                seed=seed,
                output_type="np",
                **kwargs,
            )
        dt = time.time() - t0
        frames = out.frames[0]

        encoded = []
        from PIL import Image

        for f in frames:
            buf = io.BytesIO()
            Image.fromarray(f).save(buf, format="PNG")
            encoded.append(base64.b64encode(buf.getvalue()).decode("ascii"))

        self.requests_served += 1
        self.total_seconds += dt
        return {
            "frames": encoded,
            "num_frames": len(frames),
            "timings": {"seconds": round(dt, 3)},
            "seed": seed,
        }

    def health(self) -> dict:
        import jax

        return {
            "status": "ok",
            "device": jax.default_backend(),
            "requests_served": self.requests_served,
            "avg_seconds": round(
                self.total_seconds / max(self.requests_served, 1), 3
            ),
        }


class GenerationServer:
    def __init__(self, service: GenerationService, host: str = "127.0.0.1",
                 port: int = 8080):
        self.service = service
        svc = service

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, svc.health())
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    request = json.loads(self.rfile.read(n))
                    self._reply(200, svc.generate(request))
                except Exception as e:  # noqa: BLE001 — error surface to client
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
