"""CLI entrypoint: ``torchsr train`` / ``torchsr test``.

Flag-for-flag parity with the reference CLI
(/root/reference/torchsr/torchsr.py:157-236) so existing workflows run
unchanged, with the reference's latent ``torchsr test`` crash fixed
(--seed now exists on both subcommands; SURVEY.md section 3.2) and a few
TPU-stack additions: ``--vgg-weights`` (perceptual-loss weight file),
``--tile``/``--tile-overlap`` (tiled inference), ``--num-devices``
(mesh size cap), ``--checkpoint`` (explicit test-time checkpoint).

Device selection is implicit: JAX picks up the TPU slice (or CPU) —
there is no CUDA device-count dance (reference torchsr.py:69-98);
``--num-devices`` bounds the mesh when needed.
"""

from __future__ import annotations

import os
import random
from argparse import ArgumentParser, ArgumentTypeError, Namespace

import numpy as np

from torchsr_tpu.__version__ import VERSION
from torchsr_tpu.constants import (
    BATCH_SIZE,
    EPOCHS,
    MODEL,
    PRE_EPOCHS,
    TRAIN_DIR,
)
from torchsr_tpu.registry import (
    MODEL_NAMES,
    select_test_model,
    select_trainer_model,
)


def positive_integer(value: str) -> int:
    """Argparse type: strictly positive int (reference torchsr.py:36-66)."""
    try:
        int_value = int(value)
    except (TypeError, ValueError):
        raise ArgumentTypeError(f"invalid int value: '{value}'")
    if int_value < 1:
        raise ArgumentTypeError("value must be a positive integer!")
    return int_value


def nonnegative_integer(value: str) -> int:
    """Argparse type: int >= 0 (tile sizes/overlaps, where 0 disables)."""
    try:
        int_value = int(value)
    except (TypeError, ValueError):
        raise ArgumentTypeError(f"invalid int value: '{value}'")
    if int_value < 0:
        raise ArgumentTypeError("value must be a non-negative integer!")
    return int_value


def parse_args(argv: list[str] | None = None) -> Namespace:
    parser = ArgumentParser(f"torchSR-TPU Version: {VERSION}")
    commands = parser.add_subparsers(
        dest="function", metavar="function", required=True
    )

    train = commands.add_parser(
        "train", help="Train an SRGAN model against an HD dataset."
    )
    train.add_argument(
        "--batch-size", type=int, default=BATCH_SIZE,
        help=f"The number of images to include in every batch. "
             f"Default: {BATCH_SIZE}.",
    )
    train.add_argument(
        "--data-workers", type=int, default=16,
        help="Number of parallel decode threads for the host data "
             "pipeline (preprocessing math runs on device).",
    )
    train.add_argument(
        "--dataset-multiplier", type=positive_integer, default=1,
        help="Artificially increase the dataset size by sampling N "
             "random crops per image per epoch.",
    )
    train.add_argument(
        "--steps-per-call", type=positive_integer, default=None,
        help="Training steps fused into one device program per host "
             "dispatch (lax.scan over a stacked batch axis); amortizes "
             "per-call dispatch overhead.  1 disables fusion.  Default: "
             "model-tuned (8 for pretrain; GAN phase 8 for SRGAN, "
             "unrolled 2 for ESRGAN — measured optima).  Values above "
             "the model's tuned GAN K run as lax.scan to bound compile "
             "time.",
    )
    train.add_argument(
        "--shuffle-window", type=int, default=0,
        help="Out-of-core shuffle: visit windows of N images in random "
             "order instead of one global permutation, so datasets "
             "larger than the decode-cache budget are decoded once "
             "per epoch instead of thrashing. 0 (default) = global "
             "shuffle.",
    )
    train.add_argument(
        "--disable-amp", action="store_true",
        help="Disable bfloat16 mixed precision (the TPU equivalent of "
             "CUDA AMP) and train in float32.",
    )
    train.add_argument(
        "--fast-compile", action="store_true",
        help="Iteration/debug mode: run the generator tower as one "
             "nn.scan'd block. Cold XLA compiles drop from minutes to "
             "tens of seconds at a measured per-step runtime cost "
             "(docs/benchmarks.md); checkpoints stay interchangeable "
             "with normal runs (optimizer state excepted).",
    )
    train.add_argument(
        "--epochs", type=int, default=EPOCHS,
        help=f"The number of epochs to run training for. "
             f"Default: {EPOCHS}.",
    )
    train.add_argument(
        "--gan-checkpoint", type=str,
        help="Existing trained model for the GAN-based training phase.",
    )
    train.add_argument(
        "--master-addr", type=str,
        help="Address used for multi-host coordination.",
    )
    train.add_argument(
        "--master-port", type=str,
        help="Port used for multi-host coordination.",
    )
    train.add_argument(
        "--model", type=str, default=MODEL, choices=MODEL_NAMES,
        help="Select the model to use for super resolution.",
    )
    train.add_argument(
        "--pretrain-epochs", type=int, default=PRE_EPOCHS,
        help=f"The number of epochs to run pretraining for. "
             f"Default: {PRE_EPOCHS}.",
    )
    train.add_argument(
        "--psnr-checkpoint", type=str,
        help="Existing trained model for the PSNR-based training phase.",
    )
    train.add_argument(
        "--seed", type=int, default=0,
        help="Seed for random number generation (0 keeps the "
             "deterministic default pipeline seed).",
    )
    train.add_argument(
        "--skip-image-save", action="store_true",
        help="Skip generating and saving the per-epoch sample image.",
    )
    train.add_argument(
        "--no-preempt-save", action="store_true",
        help="Disable the SIGTERM preemption handler (by default a "
             "termination signal checkpoints the full training state "
             "at the next step boundary and exits cleanly).",
    )
    train.add_argument(
        "--train-dir", type=str, default=TRAIN_DIR,
        help=f"Directory where training images are stored. "
             f"Default: {TRAIN_DIR}.",
    )
    train.add_argument(
        "--eval-dir", type=str,
        help="Validate on ALL images in this directory (e.g. "
             "DIV2K_valid next to DIV2K_train) instead of holding out "
             "10%% of --train-dir; training then uses the full train "
             "directory.",
    )
    train.add_argument(
        "--vgg-weights", type=str,
        help="Path to a torchvision VGG19 .pth (converted automatically) "
             "or converted .ckpt for the perceptual loss. Without it, "
             "weights are auto-discovered from TORCHSR_VGG_WEIGHTS, "
             "~/.cache/torchsr_tpu/ (tools/fetch_vgg19.py), or the "
             "torch hub cache; if none exist a deterministic "
             "random-feature VGG is used (with a loud warning).",
    )
    train.add_argument(
        "--num-devices", type=int,
        help="Limit the data-parallel mesh to the first N local devices.",
    )
    train.add_argument(
        "--sample-image", type=str,
        help="Override the per-epoch progress sample image path "
             "(default: media/waterfalls-low-res.png).",
    )
    train.add_argument(
        "--crop-size", type=positive_integer,
        help="Override the HR training crop size (default: 96 for "
             "SRGAN, 128 for ESRGAN, matching the reference registry).",
    )
    train.add_argument(
        "--scale", type=int, default=4, choices=(2, 4, 8),
        dest="upscale_factor",
        help="Upscale factor (the reference hard-codes 4x). Sets the "
             "generator's upsample stage count (log2(scale)) and the "
             "LR synthesis ratio; test/eval/export/serve auto-detect "
             "the scale from the checkpoint, no flag needed there.",
    )
    train.add_argument(
        "--gen-blocks", type=positive_integer, dest="num_residual",
        help="Override the generator residual-block count (16 for "
             "SRGAN, 23 RRDBs for ESRGAN); smaller = faster/smaller "
             "models.",
    )
    train.add_argument(
        "--vgg-convs", type=positive_integer,
        help="Truncate the perceptual-loss VGG19 trunk to the first N "
             "convolutions (default: the full 16-conv relu5_4 trunk).",
    )
    train.add_argument(
        "--sync-saves", action="store_true",
        help="Write checkpoints synchronously in the epoch loop instead "
             "of the default async writer thread (which snapshots the "
             "state on device and streams it to disk while training "
             "continues; under multi-process every process joins the "
             "snapshot and rank 0 streams the write).",
    )
    train.add_argument(
        "--metrics-file", type=str, default=None,
        help="Append every logged metric dict (the WandB key contract: "
             "per-step train-loss, per-epoch PSNR/SSIM/val-loss/"
             "throughput/LRs) as one JSON line to this file — training "
             "curves without a WandB dependency. Appends across "
             "resumes; a {\"config\": ...} header line records the run "
             "flags.",
    )
    train.add_argument(
        "--profile-steps", type=int, default=0,
        help="Capture a jax.profiler device trace of N hot-loop train "
             "steps (TensorBoard format). 0 disables profiling. On TPU "
             "backends the device trace requires TORCHSR_FORCE_PROFILE=1 "
             "(some TPU runtimes hang in start_trace); without it the "
             "same window records a step-cadence summary to "
             "<profile-dir>/step_times.json instead.",
    )
    train.add_argument(
        "--profile-dir", type=str, default="traces",
        help="Output directory for profiler traces. Default: traces/.",
    )

    test = commands.add_parser(
        "test",
        help="Generate a super resolution image based on a trained "
             "SRGAN model.",
    )
    test.add_argument(
        "image", type=str,
        help="Filename of image to upres — or a directory: every "
             "supported image in it is upscaled to upres-{name}, "
             "reusing one loaded generator (and, with --tile, one "
             "compiled executable) across the batch.",
    )
    test.add_argument(
        "--model", type=str, default=MODEL, choices=MODEL_NAMES,
        help="Select the model to use for super resolution.",
    )
    test.add_argument(
        "--seed", type=int, default=0,
        help="Unused at inference; accepted for CLI compatibility.",
    )
    test.add_argument(
        "--checkpoint", type=str,
        help="Explicit checkpoint path (.ckpt or reference .pth); "
             "defaults to {model}-gan-best in the working directory.",
    )
    test.add_argument(
        "--tile", type=nonnegative_integer, default=0,
        help="Tile size for tiled overlap-blend inference (0 = one "
             "whole-image forward like the reference).",
    )
    test.add_argument(
        "--tile-overlap", type=nonnegative_integer, default=16,
        help="Halo overlap between inference tiles, in LR pixels.",
    )
    test.add_argument(
        "--tile-batch", type=positive_integer, default=8,
        help="Tiles per generator forward during tiled inference.",
    )
    test.add_argument(
        "--spatial-shard", action="store_true",
        help="Shard the image spatially over all devices with ppermute "
             "halo exchange (one collective round, fully local compute; "
             "see infer/halo.py). Uses --tile-overlap as the halo.",
    )
    test.add_argument(
        "--shard-tiles", action="store_true",
        help="Shard the tiled-inference tile batch over all devices "
             "(shard_map, zero collectives in the forward; see "
             "infer/multichip.py). Implies tiling: --tile defaults to "
             "the measured per-model serving tile when unset.",
    )
    test.add_argument(
        "--disable-amp", action="store_true",
        help="Run the generator forward in float32 (default: bfloat16 "
             "on TPU — the benchmarked configuration — float32 "
             "elsewhere).",
    )

    export = commands.add_parser(
        "export",
        help="Export a trained generator as a self-contained StableHLO "
             "serving artifact (weights baked in; loadable without the "
             "model code — see infer/serving.py).",
    )
    export.add_argument(
        "output", type=str,
        help="Output artifact path (a JSON sidecar is written next to "
             "it).",
    )
    export.add_argument(
        "--model", type=str, default=MODEL, choices=MODEL_NAMES,
        help="Model architecture of the checkpoint.",
    )
    export.add_argument(
        "--checkpoint", type=str,
        help="Checkpoint path (.ckpt or reference .pth); defaults to "
             "{model}-gan-best in the working directory.",
    )
    export.add_argument(
        "--tile", type=positive_integer, default=64,
        help="Input tile size baked into the artifact (serving runs "
             "fixed shapes; larger frames tile through it).",
    )
    export.add_argument(
        "--tile-batch", type=positive_integer, default=8,
        help="Tiles per forward baked into the artifact.",
    )
    export.add_argument(
        "--platforms", type=str, default="tpu,cpu",
        help="Comma-separated lowering targets embedded in the "
             "artifact.",
    )
    export.add_argument(
        "--bf16", action="store_true",
        help="Bake bfloat16 compute into the artifact (the benchmarked "
             "TPU serving precision); inputs/outputs stay float32 and "
             "the sidecar records compute_dtype. Quantify the quality "
             "cost beforehand with `torchsr eval --bf16`.",
    )
    export.add_argument(
        "--native-kernels", action="store_true",
        help="Bake the fused Pallas RDB kernel (Mosaic custom-calls) "
             "into an ESRGAN artifact — the measured 1.5x tiled-serving "
             "win over the pure-XLA lowering. Requires exporting ON a "
             "TPU host; restricts --platforms to tpu; the artifact is "
             "bound to the Mosaic serialization compatibility window "
             "(pure-StableHLO exports remain the portable default).",
    )
    export.add_argument(
        "--seed", type=int, default=0,
        help="Unused at export; accepted for CLI compatibility.",
    )

    serve = commands.add_parser(
        "serve",
        help="Run an HTTP serving daemon around a StableHLO artifact: "
             "POST /upscale (image in, 4x PNG out, any frame size via "
             "tiling), GET /healthz (readiness-gated), GET /metadata. "
             "Stdlib-only transport; see docs/deployment.md.",
    )
    serve.add_argument(
        "artifact", type=str, nargs="?", default=None,
        help="Serving artifact produced by `torchsr export` (portable "
             "StableHLO backend). Omit to serve a checkpoint through "
             "the live generator instead — the measured-fast path "
             "(params as jit arguments, fused Pallas RDB on TPU; see "
             "docs/deployment.md for the measured gap).",
    )
    serve.add_argument(
        "--host", type=str, default="127.0.0.1",
        help="Bind address (0.0.0.0 to accept fleet traffic).",
    )
    serve.add_argument(
        "--port", type=int, default=8765,
        help="Bind port (0 = ephemeral, printed at startup).",
    )
    serve.add_argument(
        "--tile-overlap", type=nonnegative_integer, default=0,
        help="Halo overlap in LR pixels for frames that tile through "
             "the fixed-shape program (0 = the serving default).",
    )
    serve.add_argument(
        "--model", type=str, default=MODEL, choices=MODEL_NAMES,
        help="Checkpoint backend: model architecture.",
    )
    serve.add_argument(
        "--checkpoint", type=str,
        help="Checkpoint backend: explicit path (.ckpt or reference "
             ".pth); defaults to {model}-gan-best in the working "
             "directory.",
    )
    serve.add_argument(
        "--tile", type=nonnegative_integer, default=0,
        help="Checkpoint backend: serving tile size (0 = the measured "
             "per-model default: 64 ESRGAN / 128 SRGAN).",
    )
    serve.add_argument(
        "--tile-batch", type=positive_integer, default=16,
        help="Checkpoint backend: tiles per generator forward.",
    )
    serve.add_argument(
        "--disable-amp", action="store_true",
        help="Checkpoint backend: serve in float32 (default bfloat16 "
             "on TPU, float32 elsewhere).",
    )
    serve.add_argument(
        "--shard-tiles", action="store_true",
        help="Checkpoint backend: shard each frame's tile batch over "
             "all devices (shard_map over the data mesh; see "
             "infer/multichip.py) — scale-out serving on a slice.",
    )
    serve.add_argument(
        "--batch-requests", action="store_true",
        help="Checkpoint backend: coalesce tiles from CONCURRENT "
             "requests into shared device batches (dynamic batching; "
             "infer/batching.py). Small frames that cannot fill "
             "--tile-batch on their own ride one forward together — "
             "up to tile-batch x throughput for thumbnail-scale "
             "fleets; big frames keep the on-device tiled path.",
    )
    serve.add_argument(
        "--batch-wait-ms", type=float, default=2.0,
        help="Dynamic batching: how long the device worker waits "
             "after the first queued tile for the batch to fill "
             "before launching short. Under sustained load the next "
             "batch fills while the previous call runs, so this "
             "gates only the idle->busy edge.",
    )
    serve.add_argument(
        "--max-request-mb", type=float, default=64,
        help="Reject request bodies larger than this before reading "
             "them (HTTP 413). 0 disables the limit.",
    )
    serve.add_argument(
        "--max-pending", type=int, default=8,
        help="Shed load (HTTP 503 + Retry-After) beyond this many "
             "in-flight upscales — the device serializes requests, so "
             "a bounded queue keeps tail latency bounded and gives "
             "autoscalers a saturation signal. 0 = unbounded queueing.",
    )
    serve.add_argument(
        "--max-input-mp", type=float, default=32,
        help="Reject decoded inputs larger than this many megapixels "
             "(HTTP 413) — bounds the device time one request can "
             "claim. 0 disables the limit.",
    )

    ev = commands.add_parser(
        "eval",
        help="Score a trained generator on a directory of HR images "
             "(the DIV2K-val protocol): exact training-pipeline LR "
             "synthesis, then per-image PSNR/SSIM vs the ground truth, "
             "with the naive-bicubic baseline alongside.",
    )
    ev.add_argument(
        "image_dir", type=str,
        help="Directory of HR ground-truth images to evaluate against.",
    )
    ev.add_argument(
        "--model", type=str, default=MODEL, choices=MODEL_NAMES,
        help="Model architecture of the checkpoint.",
    )
    ev.add_argument(
        "--checkpoint", type=str,
        help="Checkpoint path (.ckpt or reference .pth); defaults to "
             "{model}-gan-best in the working directory.",
    )
    ev.add_argument(
        "--artifact", type=str,
        help="Score a StableHLO serving artifact (torchsr export) "
             "instead of a checkpoint — validates the exact bytes a "
             "serving fleet runs. Overrides --checkpoint/--tile.",
    )
    ev.add_argument(
        "--crop", type=positive_integer, default=None,
        help="Center-crop HR images to NxN before scoring (all shapes "
             "equal -> one compiled forward; smaller images are "
             "skipped). Default: full images, cropped to a multiple of "
             "the 4x scale.",
    )
    ev.add_argument(
        "--tile", type=nonnegative_integer, default=0,
        help="Tile size for tiled overlap-blend inference (0 = "
             "whole-image forward; use tiling for mixed-size or large "
             "datasets to reuse one executable).",
    )
    ev.add_argument(
        "--tile-overlap", type=nonnegative_integer, default=16,
        help="Halo overlap between inference tiles, in LR pixels.",
    )
    ev.add_argument(
        "--tile-batch", type=positive_integer, default=8,
        help="Tiles per generator forward during tiled inference.",
    )
    ev.add_argument(
        "--bf16", action="store_true",
        help="Score with the bfloat16 serving forward instead of "
             "float32 — quantifies the TPU inference precision's "
             "quality cost.",
    )
    ev.add_argument(
        "--save-sr", action="store_true",
        help="Also write each super-resolved image as upres-{name}.",
    )
    ev.add_argument(
        "--report", type=str,
        help="Write the full per-image report as JSON to this path.",
    )
    ev.add_argument(
        "--seed", type=int, default=0,
        help="Unused at evaluation; accepted for CLI compatibility.",
    )

    interp = commands.add_parser(
        "interp",
        help="Network interpolation (ESRGAN paper sec. 3.4): blend the "
             "PSNR-pretrained and GAN-finetuned generators into one "
             "checkpoint for a perception/distortion tradeoff.",
    )
    interp.add_argument(
        "psnr_checkpoint", type=str,
        help="PSNR-oriented checkpoint (.ckpt or reference .pth), e.g. "
             "{model}-psnr-best.ckpt.",
    )
    interp.add_argument(
        "gan_checkpoint", type=str,
        help="GAN-oriented checkpoint (.ckpt or reference .pth), e.g. "
             "{model}-gan-best.ckpt.",
    )
    interp.add_argument(
        "--alpha", type=float, default=0.8,
        help="Interpolation weight of the GAN model: (1-alpha)*psnr + "
             "alpha*gan. 0 = pure PSNR model, 1 = pure GAN model "
             "(default 0.8, the ESRGAN paper's recommendation).",
    )
    interp.add_argument(
        "--output", "-o", type=str, default=None,
        help="Output checkpoint path (default "
             "{model}-interp-{alpha}.ckpt).",
    )
    interp.add_argument(
        "--model", type=str, default=MODEL, choices=MODEL_NAMES,
        help="Model architecture of the checkpoints (used only when "
             "converting reference .pth inputs).",
    )
    pack = commands.add_parser(
        "pack",
        help="Decode a dataset directory once into a .tsrpack archive "
             "of raw uint8 images; train/eval then mmap it with zero "
             "per-sample decode cost (--train-dir/--eval-dir accept "
             "the archive anywhere a directory works).",
    )
    pack.add_argument(
        "source", type=str,
        help="Dataset directory of .png/.jpg/.jpeg images.",
    )
    pack.add_argument(
        "output", type=str,
        help="Output archive path (conventionally .tsrpack).",
    )

    doctor = commands.add_parser(
        "doctor",
        help="Diagnose the environment: backend/devices, compile-cache "
             "state, env knobs, distributed env, checkpoints in the "
             "working directory, optional dataset check.",
    )
    doctor.add_argument(
        "--train-dir", type=str, default=None,
        help="Also discover and split a dataset directory, reporting "
             "image counts (catches empty/misnamed dataset dirs).",
    )
    doctor.add_argument(
        "--checkpoint", type=str, default=None,
        help="Inspect a checkpoint file (host-only): format, epoch/"
             "phase, param count, the block count and scale inference "
             "would auto-detect, lossless-resume extras.",
    )
    doctor.add_argument(
        "--json", action="store_true",
        help="Emit the report as JSON instead of text.",
    )
    doctor.add_argument(
        "--no-device-check", action="store_true",
        help="Skip the tiny device matmul (avoids initializing the "
             "accelerator, e.g. while a benchmark owns the chip).",
    )

    args = parser.parse_args(argv)

    # Cross-flag validation, surfaced as argparse errors (exit 2 with
    # usage) instead of shape errors deep inside the tiled kernels.
    crop = getattr(args, "crop_size", None)
    upscale = getattr(args, "upscale_factor", 4)
    if crop and crop % upscale:
        parser.error(
            f"--crop-size ({crop}) must be divisible by --scale "
            f"({upscale}): the LR crop is their quotient"
        )
    tile = getattr(args, "tile", 0)
    if tile and getattr(args, "tile_overlap", 0) >= tile:
        parser.error(
            f"--tile-overlap ({args.tile_overlap}) must be smaller "
            f"than --tile ({tile}): the tiling stride is their "
            f"difference and must stay positive"
        )
    if getattr(args, "artifact", None) and getattr(args, "bf16", False):
        parser.error(
            "--bf16 cannot be combined with --artifact: a serving "
            "artifact's compute precision is baked in at export time "
            "(score the checkpoint with --bf16, or export and score "
            "the artifact as-is)"
        )
    if (
        getattr(args, "function", "") == "serve"
        and args.artifact and args.checkpoint
    ):
        parser.error(
            "pass either a serving-artifact path or --checkpoint, "
            "not both"
        )
    if getattr(args, "shard_tiles", False):
        if getattr(args, "spatial_shard", False):
            parser.error(
                "--shard-tiles and --spatial-shard are alternative "
                "multi-device strategies; pick one"
            )
        if getattr(args, "artifact", None):
            parser.error(
                "--shard-tiles needs the checkpoint backend (a "
                "serving artifact is one opaque compiled program and "
                "cannot run inside shard_map); drop the artifact "
                "path and pass --model/--checkpoint"
            )
    return args


def _honor_platform_env() -> None:
    """Make JAX_PLATFORMS effective even under PJRT plugins that ignore
    the env var (e.g. the TPU plugin): the explicit config knob takes
    precedence, so JAX_PLATFORMS=cpu reliably forces a CPU run."""
    env = os.environ.get("JAX_PLATFORMS", "").strip()
    if env:
        import jax

        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass  # backend already initialized by the caller


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv)
    _honor_platform_env()

    if getattr(args, "seed", 0):
        random.seed(args.seed)
        np.random.seed(args.seed)

    if args.function == "test":
        from torchsr_tpu.infer.runner import run_test

        model_cls = select_test_model(args)
        out = run_test(args, model_cls)
        if os.path.isdir(args.image):
            print(f"Saved super-resolution images: {out}")
        else:
            print(f"Saved super-resolution image to {out}")
        return

    if args.function == "eval":
        from torchsr_tpu.infer.evaluate import run_eval

        model_cls = select_test_model(args)
        run_eval(args, model_cls)
        return

    if args.function == "export":
        from torchsr_tpu.infer.runner import run_export

        model_cls = select_test_model(args)
        out = run_export(args, model_cls)
        print(f"Saved serving artifact to {out}")
        return

    if args.function == "serve":
        from torchsr_tpu.infer.server import run_server

        run_server(args)
        return

    if args.function == "pack":
        from torchsr_tpu.data.packed import pack_dataset

        pack_dataset(args.source, args.output, log=print)
        return

    if args.function == "doctor":
        from torchsr_tpu.utils.doctor import run_doctor

        run_doctor(args)
        return

    if args.function == "interp":
        from torchsr_tpu.utils.interp import interpolate_checkpoints

        output = args.output or (
            f"{args.model.lower()}-interp-{args.alpha:g}.ckpt"
        )
        out = interpolate_checkpoints(
            args.psnr_checkpoint, args.gan_checkpoint, args.alpha,
            output, args.model,
        )
        print(f"Saved interpolated checkpoint to {out}")
        return

    from torchsr_tpu.data.loader import initialize_datasets
    from torchsr_tpu.parallel.mesh import detect_distributed, make_mesh
    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    dist_ctx = detect_distributed(args.master_addr, args.master_port)
    trainer_cls, crop_size = select_trainer_model(args)
    if getattr(args, "crop_size", None):
        crop_size = args.crop_size

    import jax

    mesh = make_mesh(getattr(args, "num_devices", None))
    train_loader, test_loader, train_len, test_len = initialize_datasets(
        args.train_dir,
        batch_size=args.batch_size,
        crop_size=crop_size,
        dataset_multiplier=args.dataset_multiplier,
        workers=args.data_workers,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        seed=args.seed,
        shuffle_window=getattr(args, "shuffle_window", 0),
        eval_directory=getattr(args, "eval_dir", None),
    )
    trainer = trainer_cls(
        args, train_loader, test_loader, train_len, test_len,
        mesh, dist_ctx,
    )
    trainer.train()


if __name__ == "__main__":
    main()
