"""`torchsr serve`: an HTTP daemon around a StableHLO serving artifact.

The deployment story so far ends at `ServedGenerator` — a Python
object.  Production fleets want a process: something a container
entrypoint starts, a load balancer health-checks, and clients POST
images at.  This module is that process, built entirely on the
standard library (`http.server`) so the serving image needs nothing
beyond JAX + Pillow + numpy — not flax, not the model code, not the
checkpoint machinery (the artifact bakes the weights and the lowered
compute graph; see infer/serving.py).

The reference has no serving story at all (its test.py re-launches
Python and re-loads the .pth per image, reference test.py:22-63); this
is the TPU-native endpoint beyond that.

Endpoints:

- ``GET /healthz``  — liveness + artifact metadata (model, shapes,
  compute dtype).  Returns 200 once the warmup forward has completed,
  503 before that, so rollouts gate on readiness and the first client
  request never pays the XLA compile.
- ``GET /metadata`` — the artifact's JSON sidecar, verbatim.
- ``POST /upscale`` — request body: an encoded image (PNG/JPEG/
  anything Pillow decodes).  Response: the 4x super-resolved image as
  PNG.  Frames of any size run through the artifact's fixed-shape
  program via overlap-blend tiling (``?overlap=N`` overrides the halo
  in LR pixels).

Concurrency: a ``ThreadingHTTPServer`` keeps decode/encode and slow
clients off the compute path, while a single lock serializes the
device calls — one generator forward at a time is the right policy on
a single accelerator anyway (the tile batch already fills the chip,
and serialized access gives predictable tail latency instead of XLA
queue pileups).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class UpscaleService:
    """The model side of the server: owns the artifact and the
    single-admission device lock; transport-agnostic (the tests drive
    it directly, the HTTP handler wraps it)."""

    def __init__(self, artifact_path: str, overlap: int | None = None):
        from torchsr_tpu.infer.serving import ServedGenerator

        self.generator = ServedGenerator(artifact_path)
        self.overlap = overlap
        self._lock = threading.Lock()
        self.ready = False

    def warmup(self) -> None:
        """Run one forward at the export shape so the XLA compile (and
        any platform lowering) happens before the first request."""
        import jax.numpy as jnp

        b, h, w, c = self.generator.input_shape
        x = jnp.zeros((b, h, w, c), jnp.float32)
        np.asarray(self.generator(x))  # block until executed
        self.ready = True

    def upscale_png(self, body: bytes, overlap: int | None = None) -> bytes:
        """Decode ``body``, super-resolve, return PNG bytes."""
        from PIL import Image

        img = Image.open(io.BytesIO(body)).convert("RGB")
        arr = np.asarray(img, np.uint8)
        with self._lock:
            sr = self.generator.upscale_image(
                arr, overlap=overlap if overlap is not None else self.overlap
            )
        out = Image.fromarray(
            (np.clip(sr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        )
        buf = io.BytesIO()
        out.save(buf, format="PNG")
        return buf.getvalue()


def _make_handler(service: UpscaleService):
    class Handler(BaseHTTPRequestHandler):
        # quiet per-request stderr chatter; errors still surface in
        # responses
        def log_message(self, fmt, *args):  # noqa: N802
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(
                code, json.dumps(obj).encode(), "application/json"
            )

        def do_GET(self):  # noqa: N802
            path = self.path.split("?", 1)[0]
            if path == "/healthz":
                code = 200 if service.ready else 503
                self._send_json(code, {
                    "status": "ok" if service.ready else "warming up",
                    "model": service.generator.meta.get("model", ""),
                    "input_shape": list(service.generator.input_shape),
                    "scale": service.generator.scale,
                    "compute_dtype": service.generator.meta.get(
                        "compute_dtype", "float32"
                    ),
                })
            elif path == "/metadata":
                self._send_json(200, service.generator.meta)
            else:
                self._send_json(404, {"error": f"no route {path}"})

        def do_POST(self):  # noqa: N802
            path, _, query = self.path.partition("?")
            if path != "/upscale":
                self._send_json(404, {"error": f"no route {path}"})
                return
            if not service.ready:
                self._send_json(503, {"error": "warming up"})
                return
            overlap = None
            for part in query.split("&"):
                if part.startswith("overlap="):
                    try:
                        overlap = int(part.split("=", 1)[1])
                    except ValueError:
                        self._send_json(
                            400, {"error": f"bad overlap {part!r}"}
                        )
                        return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._send_json(400, {"error": "empty request body"})
                return
            body = self.rfile.read(length)
            try:
                png = service.upscale_png(body, overlap=overlap)
            except Exception as exc:  # undecodable image, bad overlap
                self._send_json(400, {"error": str(exc)})
                return
            self._send(200, png, "image/png")

    return Handler


def make_server(
    artifact_path: str,
    host: str = "127.0.0.1",
    port: int = 8765,
    overlap: int | None = None,
    warmup: bool = True,
) -> ThreadingHTTPServer:
    """Build (and warm up) the HTTP server; caller runs
    ``serve_forever()``.  ``port=0`` binds an ephemeral port
    (``server.server_address[1]`` reports it) — used by the tests."""
    service = UpscaleService(artifact_path, overlap=overlap)
    server = ThreadingHTTPServer(
        (host, port), _make_handler(service)
    )
    server.service = service  # for tests / introspection
    if warmup:
        service.warmup()
    return server


def run_server(args) -> None:
    """The ``serve`` subcommand: block serving ``args.artifact``."""
    server = make_server(
        args.artifact, host=args.host, port=args.port,
        overlap=args.tile_overlap if args.tile_overlap else None,
        warmup=True,
    )
    host, port = server.server_address[:2]
    meta = server.service.generator.meta
    print(
        f"Serving {meta.get('model', 'model')} artifact "
        f"{args.artifact} on http://{host}:{port} "
        f"(POST /upscale, GET /healthz)"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
