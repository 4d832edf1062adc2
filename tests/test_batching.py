"""Cross-request dynamic tile batching (infer/batching.py, serve
--batch-requests).

Pins: the TileBatcher coalesces tiles from concurrent submissions into
shared fixed-shape forwards (and splits big jobs across them) with
exact per-tile results; the host extract/composite mirrors the
on-device tiled path to float tolerance; and the live HTTP daemon with
batching on answers concurrent small-frame clients with the same
pixels as the unbatched server while launching fewer device calls
than requests.
"""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from torchsr_tpu.infer.batching import (
    TileBatcher,
    composite_tiles,
    count_tiles,
    extract_tiles,
)
from torchsr_tpu.infer.tiled import tiled_upscale
from torchsr_tpu.models import SRGANGenerator

TILE = 8
SCALE = 4


def _nearest4x(batch: np.ndarray) -> np.ndarray:
    """Exact, deterministic stand-in for the generator forward."""
    return batch.repeat(SCALE, axis=1).repeat(SCALE, axis=2)


def _tiles(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.random((n, TILE, TILE, 3)).astype(np.float32)


def _make_batcher(batch=4, wait=50.0, calls=None):
    def forward(x):
        if calls is not None:
            calls.append(x.shape[0])
        return _nearest4x(x)

    return TileBatcher(
        forward, tile=TILE, scale=SCALE, batch=batch, max_wait_ms=wait
    )


def test_single_job_exact_and_split_across_calls():
    """5 tiles through batch=2: three forwards, results in order."""
    calls = []
    b = _make_batcher(batch=2, wait=0.0, calls=calls)
    try:
        tiles = _tiles(5, seed=1)
        out = b.upscale_tiles(tiles)
        np.testing.assert_array_equal(out, _nearest4x(tiles))
        assert sum(calls) >= 5  # 3 calls of 2 (last one padded)
        s = b.stats()
        assert s["batched_tiles"] == 5 and s["batched_calls"] == 3
    finally:
        b.close()


def test_concurrent_submissions_coalesce():
    """8 one-tile requests from 8 threads share device calls."""
    calls = []
    b = _make_batcher(batch=4, wait=200.0, calls=calls)
    barrier = threading.Barrier(8)
    results: dict = {}

    def client(i):
        tiles = _tiles(1, seed=i)
        barrier.wait()
        results[i] = (tiles, b.upscale_tiles(tiles))

    try:
        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            tiles, out = results[i]
            np.testing.assert_array_equal(out, _nearest4x(tiles))
        # 8 tiles at batch=4 with a generous fill wait: strictly fewer
        # forwards than requests proves cross-request coalescing (2 is
        # the ideal; scheduling may split one batch)
        assert len(calls) < 8
        assert b.stats()["batched_tiles"] == 8
    finally:
        b.close()


def test_empty_and_bad_shapes():
    b = _make_batcher()
    try:
        out = b.upscale_tiles(np.empty((0, TILE, TILE, 3), np.float32))
        assert out.shape == (0, TILE * SCALE, TILE * SCALE, 3)
        with pytest.raises(ValueError, match="expected"):
            b.upscale_tiles(np.zeros((1, TILE + 1, TILE, 3), np.float32))
    finally:
        b.close()


def test_forward_error_propagates_and_close_rejects():
    def boom(x):
        raise RuntimeError("device on fire")

    b = TileBatcher(boom, tile=TILE, scale=SCALE, batch=2, max_wait_ms=0)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            b.upscale_tiles(_tiles(3))
    finally:
        b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.upscale_tiles(_tiles(1))


def test_wrong_forward_shape_fails_caller_not_worker():
    """A misbehaving forward must fail the waiting request, and the
    worker must survive to serve the next one."""
    bad = {"on": True}

    def forward(x):
        if bad["on"]:
            return x  # un-upscaled: wrong output shape
        return _nearest4x(x)

    b = TileBatcher(forward, tile=TILE, scale=SCALE, batch=2,
                    max_wait_ms=0)
    try:
        with pytest.raises(ValueError, match="forward returned"):
            b.upscale_tiles(_tiles(1))
        bad["on"] = False
        tiles = _tiles(2, seed=9)
        np.testing.assert_array_equal(
            b.upscale_tiles(tiles), _nearest4x(tiles)
        )
    finally:
        b.close()


def test_count_tiles_matches_extraction():
    for h, w, tile, ov in [
        (5, 9, 8, 2), (8, 8, 8, 0), (30, 17, 8, 3), (64, 64, 16, 8),
    ]:
        img = np.random.default_rng(0).random((h, w, 3)).astype(np.float32)
        tiles, grid, _ = extract_tiles(img, tile, ov)
        assert count_tiles(h, w, tile, ov) == len(grid) == tiles.shape[0]


def test_host_composite_matches_device_tiled_path():
    """extract -> forward -> composite on the host reproduces
    infer/tiled.py's on-device extract/forward/overlap-add for a real
    (tiny) SRGAN generator."""
    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(11), jnp.zeros((1, 16, 16, 3)), train=False
    )

    def infer_fn(v, batch):
        return gen.apply(v, batch, train=False)

    rng = np.random.default_rng(2)
    img = rng.random((40, 26, 3)).astype(np.float32)
    tile, overlap = 16, 4

    ref = np.asarray(
        tiled_upscale(
            infer_fn, jnp.asarray(img), scale=4, tile=tile,
            overlap=overlap, tile_batch=4, params=variables,
        )
    )

    tiles, grid, padded = extract_tiles(img, tile, overlap)
    sr = np.asarray(
        jax.jit(infer_fn)(variables, jnp.asarray(tiles)), np.float32
    )
    out = composite_tiles(
        sr, grid, padded, img.shape[:2], tile, overlap, 4
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_host_composite_sub_tile_image():
    """An image smaller than one tile (the headline batching case)
    follows the same reflect-pad + single-tile math as the device
    path."""
    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)), train=False
    )

    def infer_fn(v, batch):
        return gen.apply(v, batch, train=False)

    img = np.random.default_rng(4).random((10, 13, 3)).astype(np.float32)
    tile, overlap = 16, 4
    ref = np.asarray(
        tiled_upscale(
            infer_fn, jnp.asarray(img), scale=4, tile=tile,
            overlap=overlap, tile_batch=2, params=variables,
        )
    )
    tiles, grid, padded = extract_tiles(img, tile, overlap)
    assert len(grid) == 1
    sr = np.asarray(
        jax.jit(infer_fn)(variables, jnp.asarray(tiles)), np.float32
    )
    out = composite_tiles(
        sr, grid, padded, img.shape[:2], tile, overlap, 4
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------- HTTP


@pytest.fixture(scope="module")
def batching_servers(tmp_path_factory):
    """Two checkpoint-backed daemons off one tiny checkpoint: dynamic
    batching ON and OFF, for pixel-equality comparison."""
    from torchsr_tpu.infer.server import (
        CheckpointUpscaleService,
        make_server,
    )
    from torchsr_tpu.utils.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("batch_server")
    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 8, 8, 3)), train=False
    )
    path = str(root / "srgan-gan-best.ckpt")
    save_checkpoint(
        path, 1, "gan", jax.tree.map(np.asarray, dict(variables))
    )
    servers = []
    bases = {}
    for name, batching in (("on", True), ("off", False)):
        service = CheckpointUpscaleService(
            model="srgan", checkpoint=path, tile=16, tile_batch=4,
            batch_requests=batching, batch_wait_ms=100.0,
        )
        server = make_server(port=0, service=service, warmup=True)
        threading.Thread(
            target=server.serve_forever, daemon=True
        ).start()
        servers.append(server)
        bases[name] = f"http://127.0.0.1:{server.server_address[1]}"
    yield bases
    for server in servers:
        server.shutdown()
        server.server_close()
        server.service.close()


def _post_png(base: str, h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    req = urllib.request.Request(
        base + "/upscale", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        return np.asarray(Image.open(io.BytesIO(resp.read())))


def test_server_batched_equals_unbatched(batching_servers):
    """Concurrent small frames through the batched daemon: every
    response matches the unbatched daemon pixel-for-pixel (same
    forward, mirrored composite, same uint8 rounding — only the f32
    accumulation order differs, under the 1-count quantization)."""
    seeds_sizes = [(i, 10 + i, 12 + 2 * i) for i in range(6)]
    ref = {
        s: _post_png(batching_servers["off"], h, w, s)
        for s, h, w in seeds_sizes
    }
    results: dict = {}
    barrier = threading.Barrier(len(seeds_sizes))

    def client(seed, h, w):
        barrier.wait()
        results[seed] = _post_png(batching_servers["on"], h, w, seed)

    threads = [
        threading.Thread(target=client, args=args) for args in seeds_sizes
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for seed, h, w in seeds_sizes:
        assert results[seed].shape == (h * 4, w * 4, 3)
        diff = np.abs(
            results[seed].astype(np.int32) - ref[seed].astype(np.int32)
        )
        assert diff.max() <= 1  # uint8 rounding at f32 ties only

    with urllib.request.urlopen(
        batching_servers["on"] + "/metrics", timeout=30
    ) as resp:
        m = json.loads(resp.read())
    # warmup (1 tile) + 6 one-tile requests, batch=4, 100 ms fill wait:
    # strictly fewer forwards than tiles proves cross-request batching
    assert m["batched_tiles"] >= 7
    assert m["batched_calls"] < m["batched_tiles"]
    assert m["batch_fill_mean"] is not None


def test_server_big_frame_bypasses_batcher(batching_servers):
    """A frame that fills tile_batch alone keeps the on-device tiled
    path: batched_tiles does not grow."""
    with urllib.request.urlopen(
        batching_servers["on"] + "/metrics", timeout=30
    ) as resp:
        before = json.loads(resp.read())["batched_tiles"]
    # 40x40 at tile 16 / overlap 8 -> 16 tiles >= tile_batch(4)
    out = _post_png(batching_servers["on"], 40, 40, 99)
    assert out.shape == (160, 160, 3)
    with urllib.request.urlopen(
        batching_servers["on"] + "/metrics", timeout=30
    ) as resp:
        after = json.loads(resp.read())["batched_tiles"]
    assert after == before


def test_batched_meta_and_cli_flags(batching_servers):
    with urllib.request.urlopen(
        batching_servers["on"] + "/metadata", timeout=30
    ) as resp:
        assert json.loads(resp.read())["batch_requests"] is True
    from torchsr_tpu.cli import parse_args

    args = parse_args(
        ["serve", "--batch-requests", "--batch-wait-ms", "5"]
    )
    assert args.batch_requests is True and args.batch_wait_ms == 5.0


def test_sharded_batched_forward_matches_unsharded(tmp_path):
    """--shard-tiles + --batch-requests: the cross-request batched
    forward runs under shard_map over the mesh batch axis (plain
    sharded jit would all-gather and replicate the Pallas kernel) and
    matches the single-device batched service up to uint8 rounding."""
    from torchsr_tpu.infer.server import CheckpointUpscaleService
    from torchsr_tpu.utils.checkpoint import save_checkpoint

    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 8, 8, 3)), train=False
    )
    path = str(tmp_path / "srgan-gan-best.ckpt")
    save_checkpoint(
        path, 1, "gan", jax.tree.map(np.asarray, dict(variables))
    )
    base = CheckpointUpscaleService(
        model="srgan", checkpoint=path, tile=16, tile_batch=8,
        batch_requests=True, batch_wait_ms=1.0,
    )
    sharded = CheckpointUpscaleService(
        model="srgan", checkpoint=path, tile=16, tile_batch=8,
        shard_tiles=True, batch_requests=True, batch_wait_ms=1.0,
    )
    try:
        assert sharded.meta["shard_devices"] == 8
        rng = np.random.default_rng(11)
        # 20x28 at tile 16 / overlap 8 -> fewer than 8 tiles: takes
        # the batched small-frame path on both services
        frame = rng.integers(0, 256, (20, 28, 3), dtype=np.uint8)
        a = base._guarded_upscale(frame, None)
        b = sharded._guarded_upscale(frame, None)
        assert a.shape == b.shape == (80, 112, 3)
        assert np.all(np.abs(a.astype(int) - b.astype(int)) <= 1)
        assert np.mean(a == b) > 0.99
        assert base.metrics()["batched_tiles"] > 0
        assert sharded.metrics()["batched_tiles"] > 0
    finally:
        base.close()
        sharded.close()


def test_sharded_batched_indivisible_warns(tmp_path):
    """tile_batch not divisible by the device count: constructing the
    service warns and falls back to the single-device batched jit."""
    from torchsr_tpu.infer.server import CheckpointUpscaleService
    from torchsr_tpu.utils.checkpoint import save_checkpoint

    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 8, 8, 3)), train=False
    )
    path = str(tmp_path / "srgan-gan-best.ckpt")
    save_checkpoint(
        path, 1, "gan", jax.tree.map(np.asarray, dict(variables))
    )
    with pytest.warns(UserWarning, match="not divisible"):
        svc = CheckpointUpscaleService(
            model="srgan", checkpoint=path, tile=16, tile_batch=6,
            shard_tiles=True, batch_requests=True, batch_wait_ms=1.0,
        )
    svc.close()
