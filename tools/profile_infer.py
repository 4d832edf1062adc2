"""Component-level profile of the tiled serving forward (run on TPU).

Round-5 tooling: the SRGAN tiled-inference headline sat flat at
~116.7 MP/s for three rounds with no published anatomy (the tiling
machinery was bounded at ~11% of the frame but the other ~89% — tower,
upsample stages, fused HR head at inference shapes — was guesswork).
This decomposes the serving frame with the repo's honest-timing
protocol: in-jit rep chains (scalar-coupled), slope method across two
chain lengths to cancel dispatch, a process-level throwaway phase, and
two measured phases per program keeping the second
(docs/benchmarks.md methodology; the reference's serving surface is
the monolithic forward at test.py:57-62).

    python tools/profile_infer.py --model srgan            # anatomy
    python tools/profile_infer.py --model srgan --sweep    # tile sweep

Slope components (per-rep device cost at tile-LR shapes, bf16,
train=False, batch = tile_batch):
  gen_fwd     whole generator forward (the per-chunk serving program)
  conv1       9x9 3->64 head conv + PReLU            (LR resolution)
  tower       16 residual blocks, inference BN       (LR resolution)
  conv2_skip  conv3 + BN + long-skip add             (LR resolution)
  ups0        conv3 64->256 + depth_to_space + PReLU (LR->2x)
  ups1_pre    conv3 64->256 + PReLU, NO shuffle      (2x, pre-fold)
  head        SubpixelSpaceConv 9x9 in_fold=2        (subpixel space)

Frame-level probes (per 1080p->4K frame, per-call timing — at ~300 ms
per frame the ~4 ms dispatch floor is noise):
  frame       the real tiled_upscale (production serving path)
  machinery   tiled_upscale with the generator stubbed to a nearest
              4x upsample: tile gather + lax.map overhead + overlap-add
              blend + normalize, everything but the network
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="srgan",
                    choices=["srgan", "esrgan"])
    ap.add_argument("--tile", type=int, default=0,
                    help="LR tile size (default: model serving default)")
    ap.add_argument("--overlap", type=int, default=0,
                    help="default: 16 srgan / 8 esrgan")
    ap.add_argument("--tile-batch", type=int, default=0,
                    help="default: 8 srgan / 16 esrgan")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n1", type=int, default=1)
    ap.add_argument("--n2", type=int, default=3)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--components", default="",
                    help="comma-separated subset (default: all)")
    ap.add_argument("--sweep", action="store_true",
                    help="tile/tile-batch frame sweep instead of anatomy")
    ap.add_argument("--tiles", default="96,128,160,192,224,256",
                    help="sweep: comma-separated LR tile sizes")
    ap.add_argument("--batches", default="4,8,16",
                    help="sweep: comma-separated tile-batch sizes")
    args = ap.parse_args()
    only = set(filter(None, args.components.split(",")))

    def want(name):
        return not only or name in only

    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.infer.tiled import DEFAULT_SERVING_TILE, tiled_upscale

    esr = args.model == "esrgan"
    tile = args.tile or DEFAULT_SERVING_TILE[args.model]
    overlap = args.overlap or (8 if esr else 16)
    tile_batch = args.tile_batch or (16 if esr else 8)
    dtype = jnp.bfloat16

    if esr:
        from torchsr_tpu.models import ESRGANGenerator as Gen
    else:
        from torchsr_tpu.models import SRGANGenerator as Gen

    gen = Gen(dtype=dtype)
    variables = jax.device_put(
        gen.init(jax.random.PRNGKey(0), jnp.zeros((1, tile, tile, 3)),
                 train=False)
    )

    def infer_fn(v, batch):
        return gen.apply(v, batch, train=False)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((1080, 1920, 3)).astype(np.float32))

    # ---------- timing protocol (profile_gan_step.py discipline) ------
    def couple(x, s):
        return x * (1.0 + 1e-12 * s).astype(x.dtype)

    def make_chain(rep, n):
        @jax.jit
        def chain(s):
            for _ in range(n):
                s = rep(s)
            return s

        return chain

    def timed(chain):
        s0 = jnp.float32(0.0)
        float(chain(s0))  # compile + warmup readback
        for _phase in range(2):
            t0 = time.perf_counter()
            s = s0
            for _ in range(args.iters):
                s = chain(s) * 1e-6
            float(s)
            elapsed = time.perf_counter() - t0
        return elapsed / args.iters

    results: dict[str, float] = {}

    def slope(rep, name):
        try:
            c1 = make_chain(rep, args.n1)
            c2 = make_chain(rep, args.n2)
            t1 = timed(c1)
            t2 = timed(c2)
        except Exception as e:  # keep profiling the other components
            print(f"  {name:14s} ERROR: {str(e)[:120]}")
            return None
        per_rep = (t2 - t1) / (args.n2 - args.n1)
        results[name] = per_rep * 1e3
        print(f"  {name:14s} {per_rep * 1e3:8.3f} ms/rep")
        return per_rep

    # Process-level throwaway: the FIRST timing loop in a process reads
    # 2-10x slow even with warmup+readback (docs/benchmarks.md).
    x_throw = jnp.ones((tile_batch, tile, tile, 3), jnp.float32)

    def rep_throw(s):
        return jnp.mean(couple(x_throw, s) * 2.0)

    make_chain(rep_throw, 1)  # noqa: B018 - compile path
    timed(make_chain(rep_throw, 1))
    timed(make_chain(rep_throw, 3))

    # ---------- frame-level probes ------------------------------------
    def time_frame(run, label):
        out = run()
        float(out.mean())
        for _phase in range(2):
            t0 = time.perf_counter()
            for _ in range(args.frames):
                out = run()
            float(out.mean())
            elapsed = time.perf_counter() - t0
        per_frame = elapsed / args.frames
        mp = 4320 * 7680 / 1e6 / per_frame
        results[label] = per_frame * 1e3
        print(f"  {label:14s} {per_frame * 1e3:8.1f} ms/frame"
              f"  ({mp:.2f} MP/s)")
        return per_frame

    if args.sweep:
        print(f"# {args.model} frame sweep (1080p->4K, overlap "
              f"{overlap}, bf16)")
        combos = []
        for t in (int(v) for v in args.tiles.split(",")):
            for b in (int(v) for v in args.batches.split(",")):
                if t * t * b <= 256 * 256 * 16:  # bound VMEM/HBM growth
                    combos.append((t, b))
        # Throwaway frame phase first (first-timed-variant bias).
        base_run = lambda: tiled_upscale(  # noqa: E731
            infer_fn, frame, scale=4, tile=tile, overlap=overlap,
            tile_batch=tile_batch, params=variables,
        )
        time_frame(base_run, "throwaway")
        rows = []
        for t, b in combos:
            def run(t=t, b=b):
                return tiled_upscale(
                    infer_fn, frame, scale=4, tile=t, overlap=overlap,
                    tile_batch=b, params=variables,
                )

            per = time_frame(run, f"tile{t}_b{b}")
            n_y = len(range(0, 1080 - t + 1, t - overlap)) + (
                0 if (1080 - t) % (t - overlap) == 0 else 1
            )
            n_x = len(range(0, 1920 - t + 1, t - overlap)) + (
                0 if (1920 - t) % (t - overlap) == 0 else 1
            )
            redundancy = n_y * n_x * t * t / (1080 * 1920)
            rows.append((t, b, per * 1e3,
                         4320 * 7680 / 1e6 / per, redundancy))
        print("\ntile batch ms/frame MP/s redundancy")
        for t, b, ms, mp, r in sorted(rows, key=lambda x: -x[3]):
            print(f"{t:4d} {b:5d} {ms:8.1f} {mp:6.2f} {r:.3f}x")
        print(json.dumps({"sweep": [
            {"tile": t, "batch": b, "ms_per_frame": round(ms, 1),
             "mp_per_sec": round(mp, 2), "redundancy": round(r, 3)}
            for t, b, ms, mp, r in rows
        ]}))
        return

    print(f"# {args.model} serving anatomy: tile {tile}, overlap "
          f"{overlap}, tile_batch {tile_batch}, bf16, train=False")

    # Whole-generator forward at the serving chunk shape.
    x_lr = jnp.asarray(
        rng.random((tile_batch, tile, tile, 3)), jnp.float32
    )

    if want("gen_fwd"):
        def rep_gen_fwd(s):
            out = infer_fn(variables, couple(x_lr, s))
            return jnp.mean(out.astype(jnp.float32))

        slope(rep_gen_fwd, "gen_fwd")

    if not esr:
        from torchsr_tpu.models.layers import (
            BatchNorm,
            Conv,
            PReLU,
            SubpixelSpaceConv,
        )
        from torchsr_tpu.models.srgan import ResidualBlock, SubpixelConv

        class _Conv1(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = Conv(64, (9, 9), dtype=dtype, name="conv1")(x)
                return PReLU(name="prelu1")(x)

        class _Tower(nn.Module):
            n: int = 16

            @nn.compact
            def __call__(self, x):
                for i in range(self.n):
                    x = ResidualBlock(64, dtype=dtype,
                                      name=f"block{i}")(x, train=False)
                return x

        class _Conv2Skip(nn.Module):
            @nn.compact
            def __call__(self, x, skip):
                out = Conv(64, (3, 3), use_bias=False, dtype=dtype,
                           name="conv2")(x)
                out = BatchNorm(use_running_average=True, dtype=dtype,
                                name="bn2")(out)
                return skip + out

        class _Ups0(nn.Module):
            @nn.compact
            def __call__(self, x):
                return SubpixelConv(64, dtype=dtype, shuffle=True,
                                    name="upsample0")(x)

        class _Ups1Pre(nn.Module):
            @nn.compact
            def __call__(self, x):
                return SubpixelConv(64, dtype=dtype, shuffle=False,
                                    name="upsample1")(x)

        class _Head(nn.Module):
            @nn.compact
            def __call__(self, x):
                return SubpixelSpaceConv(3, (9, 9), 4, dtype=dtype,
                                         in_fold=2, name="conv3")(x)

        f64_lr = jnp.asarray(
            rng.random((tile_batch, tile, tile, 64)), dtype
        )
        f64_2x = jnp.asarray(
            rng.random((tile_batch, tile * 2, tile * 2, 64)), dtype
        )
        f256_2x = jnp.asarray(
            rng.random((tile_batch, tile * 2, tile * 2, 256)), dtype
        )
        key = jax.random.PRNGKey(1)
        stages = [
            ("conv1", _Conv1(), (x_lr,)),
            ("tower", _Tower(), (f64_lr,)),
            ("conv2_skip", _Conv2Skip(), (f64_lr, f64_lr)),
            ("ups0", _Ups0(), (f64_lr,)),
            ("ups1_pre", _Ups1Pre(), (f64_2x,)),
            ("head", _Head(), (f256_2x,)),
        ]
        for name, mod, xs in stages:
            if not want(name):
                continue
            vs = jax.device_put(mod.init(key, *xs))

            def rep(s, mod=mod, vs=vs, xs=xs):
                out = mod.apply(vs, couple(xs[0], s), *xs[1:])
                return jnp.mean(out.astype(jnp.float32))

            slope(rep, name)

    if esr:
        from torchsr_tpu.models.esrgan import RRDB
        from torchsr_tpu.models.layers import (
            Conv,
            SubpixelSpaceConv,
            leaky_relu,
        )
        from torchsr_tpu.ops.resize import nearest_upsample

        class _EConv1(nn.Module):
            @nn.compact
            def __call__(self, x):
                return Conv(64, (3, 3), dtype=dtype, name="conv1")(x)

        class _ETrunk(nn.Module):
            n: int = 23
            fused: bool | None = None

            @nn.compact
            def __call__(self, x):
                for i in range(self.n):
                    x = RRDB(64, 32, 0.2, dtype=dtype,
                             fused=self.fused, fwd_only=True,
                             name=f"block{i}")(x)
                return x

        class _EConv2Skip(nn.Module):
            @nn.compact
            def __call__(self, x, skip):
                out = Conv(64, (3, 3), dtype=dtype, name="conv2")(x)
                return skip + out

        class _EUps(nn.Module):
            @nn.compact
            def __call__(self, x):
                out = nearest_upsample(x, 2)
                out = Conv(64, (3, 3), dtype=dtype, name="up")(out)
                return leaky_relu(out, 0.2)

        class _EHead(nn.Module):
            @nn.compact
            def __call__(self, x):
                out = Conv(64, (3, 3), dtype=dtype, name="conv3")(x)
                out = leaky_relu(out, 0.2)
                return SubpixelSpaceConv(3, (3, 3), 4, dtype=dtype,
                                         name="conv4")(out)

        f64_lr = jnp.asarray(
            rng.random((tile_batch, tile, tile, 64)), dtype
        )
        f64_2x = jnp.asarray(
            rng.random((tile_batch, tile * 2, tile * 2, 64)), dtype
        )
        f64_4x = jnp.asarray(
            rng.random((tile_batch, tile * 4, tile * 4, 64)), dtype
        )
        key = jax.random.PRNGKey(1)
        stages = [
            ("conv1", _EConv1(), (x_lr,)),
            ("trunk", _ETrunk(), (f64_lr,)),
            ("trunk_xla", _ETrunk(fused=False), (f64_lr,)),
            ("conv2_skip", _EConv2Skip(), (f64_lr, f64_lr)),
            ("ups1", _EUps(), (f64_lr,)),
            ("ups2", _EUps(), (f64_2x,)),
            ("head", _EHead(), (f64_4x,)),
        ]
        for name, mod, xs in stages:
            if not want(name):
                continue
            vs = jax.device_put(mod.init(key, *xs))

            def rep(s, mod=mod, vs=vs, xs=xs):
                out = mod.apply(vs, couple(xs[0], s), *xs[1:])
                return jnp.mean(out.astype(jnp.float32))

            slope(rep, name)

    # ---------- full frame + machinery --------------------------------
    if want("frame"):
        def run_frame():
            return tiled_upscale(
                infer_fn, frame, scale=4, tile=tile, overlap=overlap,
                tile_batch=tile_batch, params=variables,
            )

        time_frame(run_frame, "frame")

    if want("machinery"):
        def stub_fn(v, batch):
            # nearest 4x: trivially cheap, same output contract
            up = jnp.repeat(jnp.repeat(batch, 4, axis=1), 4, axis=2)
            return up.astype(jnp.float32)

        def run_mach():
            return tiled_upscale(
                stub_fn, frame, scale=4, tile=tile, overlap=overlap,
                tile_batch=tile_batch, params=variables,
            )

        time_frame(run_mach, "machinery")

    print(json.dumps({"model": args.model, "tile": tile,
                      "overlap": overlap, "tile_batch": tile_batch,
                      "ms": {k: round(v, 3) for k, v in
                             results.items()}}))


if __name__ == "__main__":
    main()
