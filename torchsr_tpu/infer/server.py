"""`torchsr serve`: an HTTP daemon around a trained super-resolver.

The deployment story so far ends at `ServedGenerator` — a Python
object.  Production fleets want a process: something a container
entrypoint starts, a load balancer health-checks, and clients POST
images at.  This module is that process, built entirely on the
standard library (`http.server`) so the serving image needs nothing
beyond JAX + Pillow + numpy.

The reference has no serving story at all (its test.py re-launches
Python and re-loads the .pth per image, reference test.py:22-63); this
is the TPU-native endpoint beyond that.

Two backends, one endpoint surface:

- **Artifact-backed** (`torchsr serve model.shlo`): loads a StableHLO
  serving artifact — no flax/model code on the serving path, maximum
  portability.  Measured on real v5e (tools/bench_serve_http.py,
  1080p->4K ESRGAN, device-side protocol): **11.8 MP/s vs 17.7** for
  the checkpoint backend — the 1.5x gap is the fused Pallas RDB
  kernel the artifact's pure-XLA lowering gives up.  On the tunneled
  dev runtime the artifact additionally pays ~5 s/frame of per-call
  weight-constant re-materialization (visible in readback-per-call
  tiers only; production PJRT runtimes keep constants resident).
- **Checkpoint-backed** (`torchsr serve --checkpoint x --model
  esrgan`): loads the checkpoint into the live generator — params
  ride as jit arguments, the fused Pallas RDB kernel stays active on
  TPU, bf16 serving dtype by default, and ``--shard-tiles`` scales
  each frame over a multi-chip slice.  The faster path wherever the
  serving image can carry the model code.

Endpoints:

- ``GET /healthz``  — liveness + backend metadata.  200 once the
  warmup forward has completed, 503 before that, so rollouts gate on
  readiness and the first client request never pays the XLA compile.
- ``GET /metadata`` — backend metadata (artifact sidecar, or the
  checkpoint serving configuration), verbatim JSON.
- ``POST /upscale`` — request body: an encoded image (PNG/JPEG/
  anything Pillow decodes).  Response: the super-resolved image (the
  model's scale — 4x default, auto-detected from the checkpoint),
  PNG by default; ``?format=jpeg`` or ``?format=webp`` (optional
  ``&quality=N``, default
  92) trades exactness for a much cheaper encode + smaller response —
  a 4K PNG encode costs whole seconds of host CPU, often more than
  the TPU spent upscaling; ``?compress=N`` (zlib level 0-9, default 6)
  keeps PNG exactness but trades response size for encode CPU
  (level 1: ~30% less encode time, ~9% larger).  ``?overlap=N``
  overrides the tiling halo in LR pixels.

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
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_FORMATS = {
    "png": "PNG", "jpeg": "JPEG", "jpg": "JPEG", "webp": "WEBP",
}


class RequestTooLarge(ValueError):
    """Request exceeds an admission limit — mapped to HTTP 413."""


class _Service:
    """Transport-agnostic core: decode -> locked device call -> encode.
    Subclasses implement ``_upscale(uint8 HWC) -> uint8 HWC`` (the
    [0,1]->255 rounding happens ON DEVICE so the host transfer moves
    uint8, 4x less than the f32 frame — the transfer dominates request
    latency on PCIe/tunneled runtimes) and ``warmup()``, and populate
    ``meta``."""

    def __init__(
        self,
        overlap: int | None = None,
        max_request_mb: float = 64,
        max_input_mp: float = 32,
        max_pending: int = 8,
    ):
        self.overlap = overlap
        # Admission limits (0 disables): bound what one request can
        # make the host allocate (body bytes) and the device compute
        # (decoded megapixels) — a 32 MP input is ~4x a 4K frame and
        # already a multi-second device call; beyond that is almost
        # certainly abuse or a client bug, rejected as 413.
        self.max_request_bytes = int(max_request_mb * 1e6)
        self.max_input_pixels = int(max_input_mp * 1e6)
        # Load shedding: device calls serialize behind _lock, so under
        # overload requests queue and tail latency grows without bound.
        # Beyond max_pending in-flight upscales (queued + executing)
        # new ones get 503 + Retry-After — the signal autoscalers and
        # load balancers act on.  0 = unbounded queueing.
        self.max_pending = int(max_pending)
        self._in_flight = 0
        self._shed = 0
        self._admission_lock = threading.Lock()
        self._lock = threading.Lock()
        self.ready = False
        self.meta: dict = {}
        # request counters for GET /metrics (autoscalers/dashboards);
        # guarded by its own lock so slow device calls never block a
        # metrics scrape
        self._stats_lock = threading.Lock()
        self._started = time.time()
        self._requests = 0
        self._errors = 0
        self._total_ms = 0.0
        self._device_ms = 0.0
        self._last_ms = 0.0

    def metrics(self) -> dict:
        """Counters since startup: request/error totals, mean and last
        wall latency, the device-locked share of the mean, uptime."""
        with self._stats_lock:
            n = self._requests
            with self._admission_lock:
                in_flight, shed = self._in_flight, self._shed
            return {
                "ready": self.ready,
                "uptime_s": round(time.time() - self._started, 1),
                "requests": n,
                "errors": self._errors,
                "in_flight": in_flight,
                "shed": shed,
                "latency_ms_mean": round(self._total_ms / n, 1) if n else None,
                "latency_ms_last": round(self._last_ms, 1) if n else None,
                "device_ms_mean": round(self._device_ms / n, 1) if n else None,
            }

    def admit(self) -> bool:
        """Reserve an upscale slot; False = shed this request (503)."""
        with self._admission_lock:
            if self.max_pending and self._in_flight >= self.max_pending:
                self._shed += 1
                return False
            self._in_flight += 1
            return True

    def release(self) -> None:
        with self._admission_lock:
            self._in_flight -= 1

    def _upscale(self, arr: np.ndarray, overlap: int | None) -> np.ndarray:
        raise NotImplementedError

    def _guarded_upscale(
        self, arr: np.ndarray, overlap: int | None
    ) -> np.ndarray:
        """Device-access policy around ``_upscale``: one forward at a
        time by default.  Backends with their own device scheduling
        (the dynamic tile batcher) override this."""
        with self._lock:
            return self._upscale(arr, overlap)

    def warmup(self) -> None:
        raise NotImplementedError

    def close(self) -> None:
        """Release backend resources (worker threads); idempotent."""

    def upscale_bytes(
        self,
        body: bytes,
        overlap: int | None = None,
        fmt: str = "png",
        quality: int = 92,
        compress: int = 6,
    ) -> tuple[bytes, str]:
        """Decode ``body``, super-resolve, encode; returns
        ``(payload, content_type)``."""
        from PIL import Image

        t0 = time.time()
        try:
            pil_fmt = _FORMATS.get(fmt.lower())
            if pil_fmt is None:
                raise ValueError(
                    f"unsupported format {fmt!r} (use png, jpeg, or "
                    f"webp)"
                )
            img = Image.open(io.BytesIO(body))
            # size comes from the header — check BEFORE .convert()
            # triggers the full decode
            if (
                self.max_input_pixels
                and img.width * img.height > self.max_input_pixels
            ):
                raise RequestTooLarge(
                    f"input is {img.width}x{img.height} "
                    f"({img.width * img.height / 1e6:.1f} MP); this "
                    f"server caps inputs at "
                    f"{self.max_input_pixels / 1e6:g} MP"
                )
            arr = np.asarray(img.convert("RGB"), np.uint8)
            t_dev = time.time()
            sr = self._guarded_upscale(
                arr, overlap if overlap is not None else self.overlap
            )
            dev_ms = (time.time() - t_dev) * 1e3
            out = Image.fromarray(np.asarray(sr, np.uint8))
            buf = io.BytesIO()
            if pil_fmt == "JPEG":
                out.save(buf, format="JPEG", quality=int(quality))
                payload, ctype = buf.getvalue(), "image/jpeg"
            elif pil_fmt == "WEBP":
                # ~25-30% smaller than JPEG at equal quality; honors
                # the same ?quality=N knob
                out.save(buf, format="WEBP", quality=int(quality))
                payload, ctype = buf.getvalue(), "image/webp"
            else:
                # zlib level: a 4K PNG encode costs whole seconds of a
                # small serving host; level 1 cuts that ~30% (more on
                # noisy frames) for ~9% larger responses.  6 = zlib/PIL
                # default; exposed as ?compress=N.
                level = min(max(int(compress), 0), 9)
                out.save(buf, format="PNG", compress_level=level)
                payload, ctype = buf.getvalue(), "image/png"
        except Exception:
            with self._stats_lock:
                self._errors += 1
            raise
        with self._stats_lock:
            self._requests += 1
            self._last_ms = (time.time() - t0) * 1e3
            self._total_ms += self._last_ms
            self._device_ms += dev_ms
        return payload, ctype

    # kept for back-compat with early adopters of the module API
    def upscale_png(self, body: bytes, overlap: int | None = None) -> bytes:
        return self.upscale_bytes(body, overlap=overlap, fmt="png")[0]


class UpscaleService(_Service):
    """Artifact-backed service around a StableHLO blob."""

    def __init__(
        self, artifact_path: str, overlap: int | None = None, **limits
    ):
        from torchsr_tpu.infer.serving import ServedGenerator

        super().__init__(overlap, **limits)
        self.generator = ServedGenerator(artifact_path)
        self.meta = {"backend": "artifact", **self.generator.meta}

    def warmup(self) -> None:
        """One forward at the export shape so the XLA compile (and any
        platform lowering) happens before the first request."""
        import jax.numpy as jnp

        b, h, w, c = self.generator.input_shape
        x = jnp.zeros((b, h, w, c), jnp.float32)
        np.asarray(self.generator(x))  # block until executed
        self.ready = True

    def _upscale(self, arr: np.ndarray, overlap: int | None) -> np.ndarray:
        return self.generator.upscale_image(
            arr, overlap=overlap, quantize_u8=True
        )


class CheckpointUpscaleService(_Service):
    """Checkpoint-backed service: the live generator with params as
    jit arguments (never compiled-in constants) and the fused Pallas
    RDB kernel active on TPU — the measured-fast serving path.

    ``shard_tiles=True`` additionally shards each frame's tile batch
    over every visible device (shard_map over a 1-D data mesh, zero
    collectives in the forward; infer/multichip.py) — scale-out
    serving on a slice, checkpoint backend only (an artifact is one
    opaque compiled program and cannot run inside shard_map).

    ``batch_requests=True`` turns on cross-request dynamic batching
    (infer/batching.py): a request whose frame tiles to FEWER than
    ``tile_batch`` tiles is routed through a shared TileBatcher, so
    concurrent small frames fill one device batch together instead of
    each paying a padded serialized forward.  Frames big enough to
    fill a batch on their own keep the fully on-device tiled path."""

    def __init__(
        self,
        model: str,
        checkpoint: str | None = None,
        tile: int = 0,
        tile_batch: int = 16,
        overlap: int | None = None,
        disable_amp: bool = False,
        shard_tiles: bool = False,
        batch_requests: bool = False,
        batch_wait_ms: float = 2.0,
        **limits,
    ):
        from argparse import Namespace

        import jax

        from torchsr_tpu.infer.runner import (
            load_trained_generator,
            resolve_compute_dtype,
        )
        from torchsr_tpu.registry import select_test_model

        super().__init__(overlap, **limits)
        model = model.lower()
        args = Namespace(
            model=model, checkpoint=checkpoint,
            disable_amp=disable_amp,
        )
        generator_cls = select_test_model(args)
        dtype = resolve_compute_dtype(args)
        self._generator, self._variables = load_trained_generator(
            args, generator_cls, dtype=dtype,
        )
        # one stable callable: _sharded_forward hashes infer_fn as a
        # static jit argument, so it must be the same object per call
        def _infer_fn(v, batch):
            return self._generator.apply(v, batch, train=False)

        self._infer_fn = _infer_fn
        self._infer = jax.jit(_infer_fn)
        from torchsr_tpu.infer.tiled import DEFAULT_SERVING_TILE

        self.tile = int(tile) or DEFAULT_SERVING_TILE.get(model, 64)
        self.tile_batch = int(tile_batch)
        self.scale = int(self._generator.scale_factor)
        self._mesh = None
        if shard_tiles:
            from torchsr_tpu.parallel.mesh import make_mesh, replicate

            self._mesh = make_mesh()
            self._variables = replicate(self._variables, self._mesh)
        self._batcher = None
        if batch_requests:
            from torchsr_tpu.infer.batching import TileBatcher

            # With --shard-tiles, route the cross-request batch through
            # shard_map over the mesh's batch axis (pallas_call has no
            # SPMD rule: a plain sharded jit would all-gather the batch
            # and replicate the kernel on every chip).  Needs the fixed
            # tile batch to divide the device count.
            batched_infer = self._infer
            if self._mesh is not None:
                n_dev = int(self._mesh.devices.size)
                if self.tile_batch % n_dev == 0:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    batched_infer = jax.jit(
                        shard_map(
                            self._infer_fn,
                            mesh=self._mesh,
                            in_specs=(P(), P("data")),
                            out_specs=P("data"),
                            check_vma=False,
                        )
                    )
                else:
                    import warnings

                    warnings.warn(
                        "--batch-requests with --shard-tiles: tile_batch"
                        f" ({self.tile_batch}) is not divisible by the"
                        f" device count ({n_dev}); small-frame batched"
                        " forwards will run single-device.",
                        stacklevel=2,
                    )

            def _batch_forward(batch_np: np.ndarray) -> np.ndarray:
                import jax.numpy as jnp

                x = jnp.asarray(batch_np)
                # the service lock is taken HERE, by the batcher's
                # device worker, so enqueueing request threads never
                # hold it while waiting on their tiles (and the
                # unbatched big-frame path still serializes cleanly
                # against batched calls)
                with self._lock:
                    out = batched_infer(self._variables, x)
                    return np.asarray(out, np.float32)

            self._batcher = TileBatcher(
                _batch_forward, tile=self.tile, scale=self.scale,
                batch=self.tile_batch, max_wait_ms=batch_wait_ms,
            )
        self.meta = {
            "backend": "checkpoint",
            "model": model,
            "checkpoint": checkpoint or f"{model}-gan-best",
            "scale": self.scale,
            "tile": self.tile,
            "tile_batch": self.tile_batch,
            "compute_dtype": np.dtype(dtype).name,
            "shard_devices": (
                int(self._mesh.devices.size) if self._mesh else 1
            ),
            "batch_requests": bool(self._batcher is not None),
        }

    def warmup(self) -> None:
        """Compile the tiled executable on a tile-sized dummy frame
        (and, with dynamic batching on, the batcher's direct
        ``(tile_batch, tile, tile, 3)`` forward)."""
        dummy = np.zeros(
            (self.tile + 8, self.tile + 8, 3), np.uint8
        )
        self._upscale(dummy, self.overlap)
        if self._batcher is not None:
            tiny = np.zeros((self.tile, self.tile, 3), np.uint8)
            self._upscale_batched(tiny, self._resolve_overlap(None))
        self.ready = True

    def _resolve_overlap(self, overlap: int | None) -> int:
        if overlap is None:
            overlap = 8
        return max(0, min(int(overlap), self.tile - 1))

    def _guarded_upscale(
        self, arr: np.ndarray, overlap: int | None
    ) -> np.ndarray:
        """Route small frames through the shared tile batcher; frames
        that fill a device batch alone keep the on-device tiled path
        (which also owns the lock for its whole forward)."""
        if self._batcher is not None:
            from torchsr_tpu.infer.batching import count_tiles

            ov = self._resolve_overlap(overlap)
            h, w = arr.shape[:2]
            if count_tiles(h, w, self.tile, ov) < self.tile_batch:
                return self._upscale_batched(arr, ov)
        with self._lock:
            return self._upscale(arr, overlap)

    def _upscale_batched(self, arr: np.ndarray, overlap: int) -> np.ndarray:
        """Host extract -> shared batched device forward -> host
        composite (numpy mirror of the on-device overlap-add; pinned
        equal by tests/test_batching.py)."""
        from torchsr_tpu.infer.batching import (
            composite_tiles,
            extract_tiles,
        )

        x = np.asarray(arr, np.float32) / np.float32(255.0)
        tiles, grid, padded = extract_tiles(x, self.tile, overlap)
        sr = self._batcher.upscale_tiles(tiles)
        out = composite_tiles(
            sr, grid, padded, x.shape[:2], self.tile, overlap,
            self.scale,
        )
        return (np.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

    def metrics(self) -> dict:
        m = super().metrics()
        if self._batcher is not None:
            m.update(self._batcher.stats())
        return m

    def close(self) -> None:
        if self._batcher is not None:
            self._batcher.close()

    def _upscale(self, arr: np.ndarray, overlap: int | None) -> np.ndarray:
        import jax.numpy as jnp

        from torchsr_tpu.infer.tiled import tiled_upscale

        overlap = self._resolve_overlap(overlap)
        x = jnp.asarray(
            np.asarray(arr, np.float32) / np.float32(255.0), jnp.float32
        )
        if self._mesh is not None:
            from torchsr_tpu.infer.multichip import tiled_upscale_sharded

            n_dev = int(self._mesh.devices.size)
            out = tiled_upscale_sharded(
                self._infer_fn, self._variables, x, self._mesh,
                scale=self.scale, tile=self.tile, overlap=overlap,
                tile_batch_per_device=max(1, self.tile_batch // n_dev),
            )
        else:
            out = tiled_upscale(
                self._infer, x, scale=self.scale, tile=self.tile,
                overlap=overlap, tile_batch=self.tile_batch,
                params=self._variables,
            )
        # round to uint8 on device: the host transfer is the latency
        # tail, and uint8 is 4x less than the f32 frame
        u8 = (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        return np.asarray(u8)


_PROM_HELP = {
    "ready": "1 once the warmup forward has completed",
    "uptime_s": "seconds since service start",
    "requests": "total upscale requests served",
    "errors": "total failed upscale requests",
    "in_flight": "upscales currently queued or executing",
    "shed": "requests rejected 503 by load shedding",
    "latency_ms_mean": "mean request wall latency",
    "latency_ms_last": "last request wall latency",
    "device_ms_mean": "mean device-locked share of latency",
    "batched_calls": "dynamic batching: device forwards launched",
    "batched_tiles": "dynamic batching: tiles upscaled",
    "batch_fill_mean": "dynamic batching: mean batch fill fraction",
}

_PROM_COUNTERS = {"requests", "errors", "shed", "batched_calls",
                  "batched_tiles"}


def _prometheus(metrics: dict) -> str:
    """Render the /metrics dict in Prometheus exposition format."""
    lines = []
    for key, value in metrics.items():
        name = f"torchsr_{key}"
        if value is None:
            continue
        if isinstance(value, bool):
            value = int(value)
        help_text = _PROM_HELP.get(key)
        if help_text:
            lines.append(f"# HELP {name} {help_text}")
        kind = "counter" if key in _PROM_COUNTERS else "gauge"
        lines.append(f"# TYPE {name} {kind}")
        lines.append(f"{name} {value}")
    return "\n".join(lines) + "\n"


def _make_handler(service: _Service):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: every response carries Content-Length
        # (all paths go through _send), so persistent connections are
        # safe and clients skip a TCP handshake per frame.
        protocol_version = "HTTP/1.1"

        # quiet per-request stderr chatter; errors still surface in
        # responses
        def log_message(self, fmt, *args):  # noqa: N802
            pass

        def _send(
            self, code: int, body: bytes, ctype: str, headers=()
        ) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for key, value in headers:
                self.send_header(key, value)
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
                meta = service.meta
                self._send_json(code, {
                    "status": "ok" if service.ready else "warming up",
                    "backend": meta.get("backend", "artifact"),
                    "model": meta.get("model", ""),
                    "input_shape": meta.get("input_shape"),
                    "scale": meta.get("scale"),
                    "compute_dtype": meta.get(
                        "compute_dtype", "float32"
                    ),
                })
            elif path == "/metadata":
                self._send_json(200, service.meta)
            elif path == "/metrics":
                query = self.path.partition("?")[2]
                accept = self.headers.get("Accept", "")
                if (
                    "format=prometheus" in query
                    or "text/plain" in accept
                ):
                    # Prometheus exposition format — what a fleet
                    # scraper actually ingests (JSON stays the default
                    # for humans/curl).
                    self._send(
                        200, _prometheus(service.metrics()).encode(),
                        "text/plain; version=0.0.4",
                    )
                else:
                    self._send_json(200, service.metrics())
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
            fmt = "png"
            quality = 92
            compress = 6
            for part in query.split("&"):
                key, _, value = part.partition("=")
                try:
                    if key == "overlap":
                        overlap = int(value)
                    elif key == "quality":
                        quality = int(value)
                    elif key == "compress":
                        compress = int(value)
                    elif key == "format":
                        fmt = value
                except ValueError:
                    self._send_json(400, {"error": f"bad {part!r}"})
                    return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._send_json(400, {"error": "empty request body"})
                return
            if (
                service.max_request_bytes
                and length > service.max_request_bytes
            ):
                # rejected BEFORE reading: the declared size alone is
                # enough, no need to buffer the payload first
                self._send_json(413, {
                    "error": f"request body {length} bytes exceeds the "
                             f"{service.max_request_bytes / 1e6:g} MB "
                             f"limit",
                })
                return
            body = self.rfile.read(length)
            if not service.admit():
                # load shedding: the device queue is full — tell the
                # balancer/autoscaler rather than queueing unboundedly
                self._send(
                    503,
                    json.dumps({
                        "error": f"server saturated "
                                 f"({service.max_pending} upscales in "
                                 f"flight); retry",
                    }).encode(),
                    "application/json",
                    headers=(("Retry-After", "1"),),
                )
                return
            # The slot is released BEFORE any response bytes go out:
            # once a client sees a response, its slot is free — no
            # window where a finished request still counts against
            # admission (a sequential client could otherwise get shed
            # by its own previous request).
            error = None
            try:
                payload, ctype = service.upscale_bytes(
                    body, overlap=overlap, fmt=fmt, quality=quality,
                    compress=compress,
                )
            except RequestTooLarge as exc:
                error = (413, str(exc))
            except Exception as exc:  # undecodable image, bad params
                error = (400, str(exc))
            finally:
                service.release()
            if error is not None:
                self._send_json(error[0], {"error": error[1]})
                return
            self._send(200, payload, ctype)

    return Handler


def make_server(
    artifact_path: str | None = None,
    host: str = "127.0.0.1",
    port: int = 8765,
    overlap: int | None = None,
    warmup: bool = True,
    service: _Service | None = None,
) -> ThreadingHTTPServer:
    """Build (and warm up) the HTTP server; caller runs
    ``serve_forever()``.  Pass either ``artifact_path`` (artifact
    backend) or a prebuilt ``service`` (e.g.
    ``CheckpointUpscaleService``).  ``port=0`` binds an ephemeral port
    (``server.server_address[1]`` reports it) — used by the tests."""
    if service is None:
        if artifact_path is None:
            raise ValueError("need an artifact_path or a service")
        service = UpscaleService(artifact_path, overlap=overlap)
    server = ThreadingHTTPServer(
        (host, port), _make_handler(service)
    )
    server.service = service  # for tests / introspection
    if warmup:
        service.warmup()
    return server


def run_server(args) -> None:
    """The ``serve`` subcommand: block serving ``args.artifact`` or
    ``args.checkpoint``/default checkpoint."""
    overlap = args.tile_overlap if args.tile_overlap else None
    limits = {
        "max_request_mb": getattr(args, "max_request_mb", 64),
        "max_input_mp": getattr(args, "max_input_mp", 32),
        "max_pending": getattr(args, "max_pending", 8),
    }
    if getattr(args, "artifact", None):
        service: _Service = UpscaleService(
            args.artifact, overlap=overlap, **limits
        )
        what = f"artifact {args.artifact}"
    else:
        service = CheckpointUpscaleService(
            model=args.model,
            checkpoint=getattr(args, "checkpoint", None),
            tile=getattr(args, "tile", 0),
            tile_batch=getattr(args, "tile_batch", 16),
            overlap=overlap,
            disable_amp=getattr(args, "disable_amp", False),
            shard_tiles=getattr(args, "shard_tiles", False),
            batch_requests=getattr(args, "batch_requests", False),
            batch_wait_ms=getattr(args, "batch_wait_ms", 2.0),
            **limits,
        )
        what = f"checkpoint {service.meta['checkpoint']}"
    server = make_server(
        host=args.host, port=args.port, service=service, warmup=True,
    )
    # Graceful drain on SIGTERM (what k8s/docker stop sends): finish
    # the in-flight request, stop accepting, exit 0 — mirrors the
    # trainer's preemption story (train/trainer.py SIGTERM handling).
    # shutdown() must run off the main thread: the signal handler
    # interrupts serve_forever's own poll loop, and shutdown() blocks
    # until that loop exits.  Installed BEFORE the readiness print so
    # a supervisor that signals on first output never hits the default
    # (kill) disposition.
    import signal

    def _terminate(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        prev = signal.signal(signal.SIGTERM, _terminate)
    except ValueError:  # not the main thread (library/test use)
        prev = None

    host, port = server.server_address[:2]
    print(
        f"Serving {service.meta.get('model', 'model')} {what} "
        f"on http://{host}:{port} (POST /upscale, GET /healthz, "
        f"GET /metrics)"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        # handler threads are daemonic: wait (bounded) for in-flight
        # requests to finish before tearing down the batcher, so a
        # SIGTERM drain completes the work it admitted
        deadline = time.time() + 30
        while service.metrics()["in_flight"] > 0 and time.time() < deadline:
            time.sleep(0.05)
        service.close()
        if prev is not None:
            signal.signal(signal.SIGTERM, prev)
        stats = service.metrics()
        print(
            f"Server stopped cleanly after {stats['requests']} "
            f"requests ({stats['errors']} errors, up "
            f"{stats['uptime_s']} s)"
        )
