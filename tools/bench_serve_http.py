"""End-to-end latency of the `torchsr serve` HTTP path on real TPU.

Reports three tiers per backend for a 1080p->4K frame:

1. device-side ms/frame (output stays on device, scalar readback —
   the bench.py protocol; compares BACKENDS honestly),
2. direct ``_upscale`` ms/frame (adds the uint8 host readback), and
3. HTTP POST /upscale wall-clock (adds codec + transport), png + jpeg.

On the tunneled dev runtime tier 2/3 are dominated by moving ~100 MB
of output pixels through the tunnel (measured tens of seconds; a
co-located PCIe host moves the same in ~tens of ms) — do NOT read
tiers 2/3 as backend properties there; tier 1 is the portable number.

    python tools/bench_serve_http.py [--model esrgan|srgan]
        [--tile 64] [--tile-batch 16] [--frames N] [--bf16]

Artifact weights are random-init (latency does not depend on values);
pass --checkpoint to measure a trained model instead.  Run in
ISOLATION like every TPU bench (CLAUDE.md).  Timing here is honest
wall-clock per request (NOT the slope method): the quantity under test
is host-visible request latency, which IS dispatch + device + codec.
"""

from __future__ import annotations

import argparse
import io
import sys
import threading
import time
import urllib.request


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="esrgan",
                    choices=["esrgan", "srgan"])
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--tile-batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--checkpoint", type=str, default="")
    ap.add_argument("--backend", default="artifact",
                    choices=["artifact", "checkpoint"],
                    help="checkpoint = live generator (params as jit "
                         "args, fused RDB on TPU); artifact = "
                         "StableHLO blob (portable, weights baked as "
                         "constants)")
    ap.add_argument("--native-kernels", action="store_true",
                    help="artifact backend only: bake the fused Pallas "
                         "RDB kernel into the blob (export "
                         "--native-kernels; TPU-only Mosaic "
                         "custom-calls)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from torchsr_tpu.infer.server import make_server
    from torchsr_tpu.infer.serving import export_generator_artifact
    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    if args.model == "esrgan":
        from torchsr_tpu.models import ESRGANGenerator

        # Portable artifacts pin the XLA lowering (infer/runner.py
        # run_export); --native-kernels bakes the fused Pallas RDB
        # (export --native-kernels, TPU-only).
        fused = bool(args.native_kernels and args.backend == "artifact")
        gen = ESRGANGenerator(fused_rdb=fused, dtype=dtype)
    else:
        from torchsr_tpu.models import SRGANGenerator

        gen = SRGANGenerator(dtype=dtype)

    if args.checkpoint:
        from argparse import Namespace

        from torchsr_tpu.infer.runner import load_trained_generator

        gen, variables = load_trained_generator(
            Namespace(model=args.model, checkpoint=args.checkpoint),
            type(gen), dtype=dtype,
        )
    else:
        variables = gen.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.tile, args.tile, 3)), train=False,
        )

    if args.backend == "artifact":
        path = "/tmp/bench_serve_artifact.shlo"
        export_generator_artifact(
            path, gen, variables, input_hw=(args.tile, args.tile),
            batch=args.tile_batch, scale=4, model=args.model,
            platforms=(platform,),
            compute_dtype="bfloat16" if args.bf16 else "float32",
            native_kernels=bool(args.native_kernels),
        )
        kind = "native-kernel " if args.native_kernels else ""
        print(f"exported {args.model} {kind}artifact (tile {args.tile}, "
              f"batch {args.tile_batch}, {dtype.__name__}, {platform})")
        from torchsr_tpu.infer.server import UpscaleService

        service = UpscaleService(path)
    else:
        from torchsr_tpu.infer.server import CheckpointUpscaleService
        from torchsr_tpu.utils.checkpoint import save_checkpoint

        ckpt = args.checkpoint
        if not ckpt:
            ckpt = "/tmp/bench_serve_ckpt.ckpt"
            save_checkpoint(
                ckpt, 1, "gan",
                jax.tree.map(np.asarray, dict(variables)),
            )
        service = CheckpointUpscaleService(
            model=args.model, checkpoint=ckpt, tile=args.tile,
            tile_batch=args.tile_batch, disable_amp=not args.bf16,
        )
        print(f"checkpoint backend (tile {args.tile}, batch "
              f"{args.tile_batch}, "
              f"{service.meta['compute_dtype']}, {platform})")

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (1080, 1920, 3), dtype=np.uint8)

    # --- device-side protocol (output stays on device, scalar
    # readback — bench.py's tiled-inference protocol).  This is the
    # number that compares BACKENDS (artifact constants + XLA lowering
    # vs live fused generator); the endpoint numbers below additionally
    # pay the full-frame host transfer, which on a tunneled dev
    # runtime is tens of seconds of pure transport and swamps any
    # backend difference.
    from torchsr_tpu.infer.tiled import tiled_upscale

    x = jnp.asarray(frame.astype(np.float32) / 255.0)
    if args.backend == "checkpoint":
        def run_dev():
            return tiled_upscale(
                service._infer, x, scale=4, tile=service.tile,
                overlap=8, tile_batch=service.tile_batch,
                params=service._variables,
            )
    else:
        b, th, _tw, _c = service.generator.input_shape

        def run_dev():
            return tiled_upscale(
                service.generator, x, scale=4, tile=th, overlap=8,
                tile_batch=b,
            )

    t0 = time.time()
    out = run_dev()
    float(out.mean())
    print(f"warmup (compile) {time.time() - t0:.1f}s", flush=True)
    out_mp = out.shape[0] * out.shape[1] / 1e6
    # throwaway measured phase (first-loop artifact), then keep phase 2
    for _phase in range(2):
        t0 = time.time()
        for _ in range(args.frames):
            out = run_dev()
        float(out.mean())
        device_s = (time.time() - t0) / args.frames
    print(f"device-side:          {device_s * 1e3:.0f} ms/frame "
          f"({out_mp / device_s:.1f} output MP/s)")

    # --- direct endpoint path (device + uint8 host fetch, no HTTP) ---
    for _phase in range(2):
        t0 = time.time()
        for _ in range(args.frames):
            u8 = service._upscale(frame, None)
        direct_s = (time.time() - t0) / args.frames
    assert u8.dtype == np.uint8
    print(f"direct _upscale:      {direct_s * 1e3:.0f} ms/frame "
          f"({out_mp / direct_s:.1f} output MP/s; uint8 readback "
          f"{u8.nbytes / 1e6:.0f} MB)")

    # --- HTTP path ----------------------------------------------------
    server = make_server(port=0, service=service, warmup=True)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}/upscale"
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="PNG")
    body = buf.getvalue()

    def post(url: str) -> bytes:
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            return resp.read()

    for query, label in (("", "png"), ("?format=jpeg", "jpeg")):
        url = base + query
        post(url)  # route warmup
        for _phase in range(2):
            t0 = time.time()
            for _ in range(args.frames):
                payload = post(url)
            http_s = (time.time() - t0) / args.frames
        print(f"HTTP /upscale {label}:   {http_s * 1e3:.0f} ms/frame "
              f"({out_mp / http_s:.1f} output MP/s); response "
              f"{len(payload) / 1e6:.1f} MB; transport+codec tax "
              f"{(http_s - direct_s) * 1e3:.0f} ms")
    server.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
