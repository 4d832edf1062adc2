"""The `torchsr serve` HTTP daemon (infer/server.py).

Drives a real ThreadingHTTPServer on an ephemeral port with urllib:
readiness gating, metadata, PNG round-trip at 4x (both the exact
export shape and an odd size through tiling), the overlap query
override, and the error paths.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from torchsr_tpu.infer.serving import export_generator_artifact
from torchsr_tpu.infer.server import make_server
from torchsr_tpu.models import SRGANGenerator


# server objects by base URL, for tests that poke service internals
_SERVERS: dict = {}


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("server")
    gen = SRGANGenerator(num_residual=2)
    variables = gen.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 16, 16, 3)), train=False
    )
    path = str(root / "srgan.shlo")
    export_generator_artifact(
        path, gen, variables, input_hw=(16, 16), batch=2,
        scale=4, model="srgan", platforms=("cpu",),
    )
    server = make_server(path, port=0, warmup=True)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    _SERVERS[base] = server
    yield base
    server.shutdown()
    server.server_close()


def _png_bytes(h: int, w: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    return buf.getvalue()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    return urllib.request.urlopen(req, timeout=120)


def test_healthz_ready(live_server):
    with urllib.request.urlopen(live_server + "/healthz") as resp:
        assert resp.status == 200
        meta = json.loads(resp.read())
    assert meta["status"] == "ok"
    assert meta["model"] == "srgan"
    assert meta["input_shape"] == [2, 16, 16, 3]
    assert meta["scale"] == 4


def test_metadata_matches_sidecar(live_server):
    with urllib.request.urlopen(live_server + "/metadata") as resp:
        meta = json.loads(resp.read())
    assert meta["output_shape"] == [2, 64, 64, 3]
    assert meta["compute_dtype"] == "float32"


def test_upscale_roundtrip_exact_shape(live_server):
    with _post(live_server + "/upscale", _png_bytes(16, 16)) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/png"
        out = Image.open(io.BytesIO(resp.read()))
    assert out.size == (64, 64)


def test_upscale_arbitrary_size_tiles(live_server):
    with _post(live_server + "/upscale", _png_bytes(20, 24, 1)) as resp:
        out = Image.open(io.BytesIO(resp.read()))
    assert out.size == (96, 80)  # PIL size is (W, H)


def test_upscale_overlap_override(live_server):
    with _post(
        live_server + "/upscale?overlap=4", _png_bytes(20, 24, 2)
    ) as resp:
        out = Image.open(io.BytesIO(resp.read()))
    assert out.size == (96, 80)


def test_bad_image_is_400(live_server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(live_server + "/upscale", b"this is not an image")
    assert exc_info.value.code == 400
    assert "error" in json.loads(exc_info.value.read())


def test_bad_overlap_is_400(live_server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(live_server + "/upscale?overlap=nope", _png_bytes(16, 16))
    assert exc_info.value.code == 400


def test_empty_body_is_400(live_server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(live_server + "/upscale", b"")
    assert exc_info.value.code == 400


def test_oversized_body_is_413(live_server):
    """A Content-Length above the admission limit is rejected before
    the body is read."""
    body = _png_bytes(16, 16)
    req = urllib.request.Request(
        live_server + "/upscale", data=body, method="POST",
        headers={"Content-Length": str(200 * 10 ** 6)},
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=60)
    assert err.value.code == 413
    assert "MB limit" in json.loads(err.value.read())["error"]


def test_oversized_input_pixels_is_413(live_server, monkeypatch):
    """A decoded image above the megapixel cap is rejected from the
    PNG header, without a full decode or a device call."""
    # a solid-color 7000x7000 PNG compresses to a few hundred KB
    buf = io.BytesIO()
    Image.fromarray(
        np.zeros((7000, 7000, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(live_server + "/upscale", buf.getvalue())
    assert err.value.code == 413
    assert "caps inputs" in json.loads(err.value.read())["error"]


def test_limits_disabled_with_zero():
    from torchsr_tpu.infer.server import _Service

    svc = _Service(max_request_mb=0, max_input_mp=0, max_pending=0)
    assert svc.max_request_bytes == 0
    assert svc.max_input_pixels == 0
    assert svc.admit() and svc.admit() and svc.admit()  # unbounded
    for _ in range(3):
        svc.release()


def test_load_shedding_503(live_server):
    """Beyond max_pending in-flight upscales, new requests shed with
    503 + Retry-After instead of queueing on the device lock."""
    import urllib.request as rq

    service = _SERVERS[live_server].service
    body = _png_bytes(16, 16)
    # Saturate admission directly (deterministic — no timing games):
    # claim every slot, then a real request must shed.
    claimed = 0
    while service.admit():
        claimed += 1
        assert claimed <= service.max_pending
    try:
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(live_server + "/upscale", body)
        assert err.value.code == 503
        assert err.value.headers["Retry-After"] == "1"
        assert "saturated" in json.loads(err.value.read())["error"]
        # /metrics reports the shed + in-flight counters
        metrics = json.loads(
            rq.urlopen(live_server + "/metrics", timeout=30).read()
        )
        assert metrics["shed"] >= 1
        assert metrics["in_flight"] == claimed
    finally:
        for _ in range(claimed):
            service.release()
    # slots released: the same request now succeeds
    resp = _post(live_server + "/upscale", body)
    assert resp.status == 200


def test_unknown_route_is_404(live_server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(live_server + "/nope", timeout=30)
    assert exc_info.value.code == 404


def test_upscale_jpeg_format(live_server):
    with _post(
        live_server + "/upscale?format=jpeg&quality=90",
        _png_bytes(16, 16, 3),
    ) as resp:
        assert resp.headers["Content-Type"] == "image/jpeg"
        out = Image.open(io.BytesIO(resp.read()))
    assert out.format == "JPEG"
    assert out.size == (64, 64)


def test_upscale_png_compress_level(live_server):
    """?compress=1 returns a valid (exact) PNG — the cheap-encode knob
    for small serving hosts; bad values are 400."""
    with _post(
        live_server + "/upscale?compress=1", _png_bytes(16, 16, 5)
    ) as resp:
        assert resp.headers["Content-Type"] == "image/png"
        fast = Image.open(io.BytesIO(resp.read()))
    assert fast.size == (64, 64)
    with _post(live_server + "/upscale", _png_bytes(16, 16, 5)) as resp:
        default = Image.open(io.BytesIO(resp.read()))
    # PNG is lossless at every zlib level: identical pixels
    assert np.array_equal(np.asarray(fast), np.asarray(default))
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(live_server + "/upscale?compress=x", _png_bytes(16, 16))
    assert exc_info.value.code == 400


def test_upscale_webp_format(live_server):
    resp = _post(
        live_server + "/upscale?format=webp&quality=80",
        _png_bytes(16, 16),
    )
    assert resp.headers["Content-Type"] == "image/webp"
    img = Image.open(io.BytesIO(resp.read()))
    assert img.format == "WEBP"
    assert img.size == (64, 64)


def test_bad_format_is_400(live_server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(live_server + "/upscale?format=tiff", _png_bytes(16, 16))
    assert exc_info.value.code == 400


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    """A tiny trained-shape SRGAN checkpoint on disk."""
    from torchsr_tpu.utils.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("ckpt_server")
    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 8, 8, 3)), train=False
    )
    path = str(root / "srgan-gan-best.ckpt")
    save_checkpoint(
        path, 1, "gan", jax.tree.map(np.asarray, dict(variables))
    )
    return path


@pytest.fixture(scope="module")
def checkpoint_server(ckpt_path):
    """Checkpoint-backed daemon: the live-generator fast path."""
    from torchsr_tpu.infer.server import (
        CheckpointUpscaleService,
        make_server,
    )

    service = CheckpointUpscaleService(
        model="srgan", checkpoint=ckpt_path, tile=16, tile_batch=2,
    )
    server = make_server(port=0, service=service, warmup=True)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()
    server.server_close()


def test_checkpoint_backend_healthz(checkpoint_server):
    with urllib.request.urlopen(checkpoint_server + "/healthz") as resp:
        assert resp.status == 200
        meta = json.loads(resp.read())
    assert meta["backend"] == "checkpoint"
    assert meta["model"] == "srgan"
    # the test backend is CPU, so the amp policy resolves to f32
    assert meta["compute_dtype"] == "float32"


def test_checkpoint_backend_upscale(checkpoint_server):
    with _post(
        checkpoint_server + "/upscale", _png_bytes(20, 24, 5)
    ) as resp:
        out = Image.open(io.BytesIO(resp.read()))
    assert out.size == (96, 80)


def test_checkpoint_backend_metadata(checkpoint_server):
    with urllib.request.urlopen(
        checkpoint_server + "/metadata"
    ) as resp:
        meta = json.loads(resp.read())
    assert meta["tile"] == 16 and meta["tile_batch"] == 2


def test_metrics_endpoint(live_server):
    _post(live_server + "/upscale", _png_bytes(16, 16, 9)).read()
    with urllib.request.urlopen(live_server + "/metrics") as resp:
        m = json.loads(resp.read())
    assert m["ready"] is True
    assert m["requests"] >= 1
    assert m["uptime_s"] > 0
    assert m["latency_ms_mean"] > 0
    assert 0 < m["device_ms_mean"] <= m["latency_ms_mean"]
    before = m["errors"]
    with pytest.raises(urllib.error.HTTPError):
        _post(live_server + "/upscale", b"not an image")
    with urllib.request.urlopen(live_server + "/metrics") as resp:
        m2 = json.loads(resp.read())
    assert m2["errors"] == before + 1
    assert m2["requests"] >= m["requests"]


@pytest.mark.slow
def test_metrics_prometheus_format(live_server):
    import urllib.request as rq

    # trigger at least one request so counters are non-trivial
    _post(live_server + "/upscale", _png_bytes(16, 16))
    resp = rq.urlopen(
        live_server + "/metrics?format=prometheus", timeout=30
    )
    assert resp.headers["Content-Type"].startswith("text/plain")
    body = resp.read().decode()
    assert "# TYPE torchsr_requests counter" in body
    assert "torchsr_ready 1" in body
    assert "# HELP torchsr_shed " in body
    # Accept-header negotiation works too
    req = rq.Request(
        live_server + "/metrics", headers={"Accept": "text/plain"}
    )
    body2 = rq.urlopen(req, timeout=30).read().decode()
    assert "# TYPE torchsr_requests counter" in body2


def test_http11_keepalive_two_requests_one_connection(live_server):
    import http.client

    host = live_server.split("//", 1)[1]
    conn = http.client.HTTPConnection(host, timeout=60)
    body = _png_bytes(16, 16)
    for _ in range(2):
        conn.request("POST", "/upscale", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.version == 11
        resp.read()  # drain so the connection is reusable
    conn.close()


def test_sigterm_graceful_shutdown(ckpt_path, tmp_path):
    """`torchsr serve` + SIGTERM == drain and exit 0 (what k8s sends)."""
    import os
    import pathlib
    import signal
    import subprocess
    import sys
    import time

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "torchsr_tpu", "serve",
         "--model", "srgan", "--checkpoint", ckpt_path,
         "--tile", "16", "--tile-batch", "2", "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=tmp_path, env=env, text=True,
    )
    try:
        deadline = time.time() + 300
        for raw in proc.stdout:
            if "Serving" in raw:
                break
            assert time.time() < deadline, "server never became ready"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0
    assert "stopped cleanly" in out


def test_shard_tiles_service_matches_unsharded(ckpt_path):
    """shard_tiles=True (tile batch shard_map'd over the 8 virtual
    devices) returns the same uint8 frame as the single-device tiled
    path, up to the rounding flips float reassociation can cause."""
    from torchsr_tpu.infer.server import CheckpointUpscaleService

    base = CheckpointUpscaleService(
        model="srgan", checkpoint=ckpt_path, tile=16, tile_batch=8,
    )
    sharded = CheckpointUpscaleService(
        model="srgan", checkpoint=ckpt_path, tile=16, tile_batch=8,
        shard_tiles=True,
    )
    assert sharded.meta["shard_devices"] == 8
    assert base.meta["shard_devices"] == 1
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    a = base._upscale(frame, None)
    b = sharded._upscale(frame, None)
    assert a.shape == b.shape == (96, 160, 3)
    assert a.dtype == b.dtype == np.uint8
    assert np.all(np.abs(a.astype(int) - b.astype(int)) <= 1)
    assert np.mean(a == b) > 0.99


def test_shard_tiles_cli_flags():
    from torchsr_tpu.cli import parse_args

    args = parse_args(["serve", "--model", "srgan", "--shard-tiles"])
    assert args.shard_tiles and args.artifact is None
    args = parse_args(["test", "img.png", "--shard-tiles"])
    assert args.shard_tiles
    # artifact backend cannot shard (one opaque compiled program)
    with pytest.raises(SystemExit):
        parse_args(["serve", "m.shlo", "--shard-tiles"])
    # the two multi-device inference strategies are exclusive
    with pytest.raises(SystemExit):
        parse_args(
            ["test", "img.png", "--shard-tiles", "--spatial-shard"]
        )


def test_cli_has_serve_subcommand():
    from torchsr_tpu.cli import parse_args

    args = parse_args(["serve", "model.shlo", "--port", "0"])
    assert args.function == "serve"
    assert args.artifact == "model.shlo"
    assert args.port == 0
    assert args.host == "127.0.0.1"
    # checkpoint backend: artifact omitted
    args = parse_args(["serve", "--model", "srgan", "--tile", "32"])
    assert args.artifact is None and args.tile == 32
    # both backends at once is a usage error
    with pytest.raises(SystemExit):
        parse_args(["serve", "m.shlo", "--checkpoint", "x.ckpt"])
