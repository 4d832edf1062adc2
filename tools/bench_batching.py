"""Small-frame serving throughput: dynamic batching ON vs OFF.

The scenario `--batch-requests` exists for: many concurrent clients
posting frames at or below one tile, where the per-frame device batch
is pure padding and every request pays a serialized dispatch.  This
tool drives the CheckpointUpscaleService directly (no HTTP codec noise
— tools/bench_serve_http.py covers transport) with M client threads x
K requests of a tile-sized frame, batching off then on, and reports
frames/s plus the batcher's measured fill.

    python tools/bench_batching.py [--model srgan] [--tile 64]
        [--tile-batch 16] [--clients 16] [--requests 8]

Run in ISOLATION like every TPU bench (CLAUDE.md).  Timing is honest
wall-clock over all requests (NOT the slope method): the quantity
under test is host-visible request throughput, which IS dispatch +
device + queueing.  Expect the win to track the dispatch share: on
runtimes with multi-ms per-call dispatch (the dev tunnel) batching
approaches tile_batch x for one-tile frames; on co-located hosts the
ceiling is the device's padded-slot waste alone.
"""

from __future__ import annotations

import argparse
import io
import threading
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="srgan",
                    choices=["srgan", "esrgan"])
    ap.add_argument("--checkpoint", type=str, default="",
                    help="optional trained checkpoint (.ckpt/.pth); "
                         "random-init otherwise (throughput does not "
                         "depend on weight values)")
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--tile-batch", type=int, default=16)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=8,
                    help="requests per client per measured phase")
    ap.add_argument("--frame", type=int, default=0,
                    help="LR frame edge (default: --tile, one tile)")
    ap.add_argument("--wait-ms", type=float, default=2.0)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from torchsr_tpu.infer.server import CheckpointUpscaleService

    frame = args.frame or args.tile
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 256, (frame, frame, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    png = buf.getvalue()

    ckpt = args.checkpoint or None
    if ckpt is None:
        # random-init checkpoint on the fly so the service loader has
        # a file to read
        import tempfile

        import jax
        import jax.numpy as jnp

        from argparse import Namespace

        from torchsr_tpu.registry import select_test_model
        from torchsr_tpu.utils.checkpoint import save_checkpoint

        gen = select_test_model(Namespace(model=args.model))()
        variables = gen.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.tile, args.tile, 3)),
            train=False,
        )
        tmp = tempfile.NamedTemporaryFile(
            suffix=".ckpt", delete=False
        )
        save_checkpoint(
            tmp.name, 1, "gan",
            jax.tree.map(np.asarray, dict(variables)),
        )
        ckpt = tmp.name

    def run(batching: bool) -> tuple[float, dict]:
        service = CheckpointUpscaleService(
            model=args.model, checkpoint=ckpt, tile=args.tile,
            tile_batch=args.tile_batch, batch_requests=batching,
            batch_wait_ms=args.wait_ms, max_pending=0,
        )
        service.warmup()

        def client(n: int) -> None:
            for _ in range(n):
                service.upscale_bytes(png, fmt="png", compress=1)

        def phase() -> float:
            threads = [
                threading.Thread(
                    target=client, args=(args.requests,)
                )
                for _ in range(args.clients)
            ]
            t0 = time.time()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return time.time() - t0

        phase()  # throwaway measured phase (CLAUDE.md timing rule)
        wall = phase()
        total = args.clients * args.requests
        stats = service.metrics()
        service.close()
        return total / wall, stats

    fps_off, _ = run(False)
    fps_on, stats = run(True)
    fill = stats.get("batch_fill_mean")
    print(
        f"{args.model} tile={args.tile} batch={args.tile_batch} "
        f"{args.clients} clients x {args.requests} req of "
        f"{frame}px frames:"
    )
    print(f"  batching OFF: {fps_off:8.1f} frames/s")
    print(
        f"  batching ON : {fps_on:8.1f} frames/s "
        f"({fps_on / fps_off:.2f}x, mean batch fill "
        f"{fill if fill is not None else 'n/a'})"
    )


if __name__ == "__main__":
    main()
