"""StableHLO serving artifacts (infer/serving.py, CLI `export`).

Pins: export -> deserialize -> call reproduces the live generator
exactly; the artifact drives tiled upscaling of frames larger than the
export shape; the sidecar metadata matches; and the CLI subcommand
round-trips from a trained checkpoint.
"""

import json
import subprocess
import sys
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.infer.serving import (
    ServedGenerator,
    export_generator_artifact,
)
from torchsr_tpu.models import SRGANGenerator

REPO = str(pathlib.Path(__file__).resolve().parents[1])


@pytest.fixture(scope="module")
def tiny_artifact(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving")
    gen = SRGANGenerator(num_residual=2)
    rng = jax.random.PRNGKey(3)
    variables = gen.init(rng, jnp.zeros((1, 16, 16, 3)), train=False)
    path = str(root / "srgan.shlo")
    export_generator_artifact(
        path, gen, variables, input_hw=(16, 16), batch=2,
        scale=4, model="srgan", platforms=("cpu",),
    )
    return path, gen, variables


def test_artifact_matches_live_generator(tiny_artifact):
    path, gen, variables = tiny_artifact
    served = ServedGenerator(path)
    assert served.input_shape == (2, 16, 16, 3)
    assert served.scale == 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    out_live = gen.apply(variables, x, train=False)
    out_served = served(x)
    assert out_served.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(
        np.asarray(out_served), np.asarray(out_live),
        rtol=1e-5, atol=1e-5,
    )
    meta = json.load(open(path + ".json"))
    assert meta["model"] == "srgan"
    assert meta["output_shape"] == [2, 64, 64, 3]


def test_artifact_drives_tiled_upscale(tiny_artifact):
    """A 40x56 frame (larger than the 16px export tile) runs through
    overlap-blend tiling with the artifact as the tile forward, and
    stays close to the monolithic live forward."""
    path, gen, variables = tiny_artifact
    served = ServedGenerator(path)
    rng = np.random.default_rng(1)
    img = rng.random((40, 56, 3)).astype(np.float32)
    out = served.upscale_image(img)
    assert out.shape == (160, 224, 3)
    ref = np.asarray(
        jnp.clip(
            gen.apply(variables, jnp.asarray(img)[None], train=False)[0],
            0.0, 1.0,
        )
    )
    # overlap-blend tiling vs monolithic: differs only by boundary
    # blending.  This config is adversarial for tiling (16 px tiles, a
    # random-init generator whose receptive field spans the whole
    # tile), so the gate is structural, not pixel-tight: measured mean
    # |err| 3.2e-3 here vs production tiles' sub-quantization seams
    # (docs/benchmarks.md halo table).
    assert np.mean(np.abs(out - ref)) < 1e-2
    assert np.max(np.abs(out - ref)) < 0.2


def test_exact_shape_frame_single_forward(tmp_path):
    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)), train=False
    )
    path = str(tmp_path / "one.shlo")
    export_generator_artifact(
        path, gen, variables, input_hw=(12, 12), batch=1,
        scale=4, model="srgan", platforms=("cpu",),
    )
    served = ServedGenerator(path)
    img = np.random.default_rng(2).random((12, 12, 3)).astype(np.float32)
    out = served.upscale_image(img)
    ref = np.asarray(
        jnp.clip(
            gen.apply(variables, jnp.asarray(img)[None], train=False)[0],
            0.0, 1.0,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_artifact_loads_without_torchsr_tpu(tiny_artifact, tmp_path):
    """The deployment claim: a serving process needs only jax — no
    torchsr_tpu, flax model code, or checkpoints.  Run the artifact in
    a clean subprocess whose PYTHONPATH excludes this repo."""
    path, gen, variables = tiny_artifact
    script = tmp_path / "serve.py"
    script.write_text(
        "import sys\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax import export\n"
        "import jax.numpy as jnp\n"
        "import numpy as np\n"
        "exp = export.deserialize(open(sys.argv[1], 'rb').read())\n"
        "x = jnp.asarray(np.full((2, 16, 16, 3), 0.5, np.float32))\n"
        "out = exp.call(x)\n"
        "assert out.shape == (2, 64, 64, 3), out.shape\n"
        "assert bool(jnp.all(jnp.isfinite(out)))\n"
        "assert 'torchsr_tpu' not in sys.modules\n"
        "print('SERVED_OK', float(out.mean()))\n"
    )
    env = {
        **{k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        "JAX_PLATFORMS": "cpu",
    }
    run = subprocess.run(
        [sys.executable, str(script), path],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    assert "SERVED_OK" in run.stdout
    # and the value matches the live generator
    x = jnp.full((2, 16, 16, 3), 0.5, jnp.float32)
    live = float(gen.apply(variables, x, train=False).mean())
    served_val = float(run.stdout.split("SERVED_OK")[1].strip())
    np.testing.assert_allclose(served_val, live, rtol=1e-5)


def test_esrgan_artifact_matches_live(tmp_path):
    """ESRGAN exports pin the XLA lowering (fused_rdb=False keeps the
    artifact pure StableHLO, no Mosaic custom-calls) and still match
    the live generator."""
    from torchsr_tpu.models import ESRGANGenerator

    gen = ESRGANGenerator(num_rrdb_blocks=1, fused_rdb=False)
    variables = gen.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 12, 12, 3)), train=False
    )
    path = str(tmp_path / "esrgan.shlo")
    export_generator_artifact(
        path, gen, variables, input_hw=(12, 12), batch=1,
        scale=4, model="esrgan", platforms=("cpu",),
    )
    served = ServedGenerator(path)
    x = jnp.asarray(
        np.random.default_rng(4).random((1, 12, 12, 3)), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(served(x)),
        np.asarray(gen.apply(variables, x, train=False)),
        rtol=1e-5, atol=1e-5,
    )


def test_bf16_artifact_f32_boundary(tiny_artifact, tmp_path):
    """`export --bf16` bakes bfloat16 compute but the artifact keeps
    the f32 in/out convention: output dtype is float32, the sidecar
    records compute_dtype, and values sit within bf16 rounding of the
    f32 artifact."""
    _path, gen, variables = tiny_artifact
    gen16 = SRGANGenerator(num_residual=2, dtype=jnp.bfloat16)
    path16 = str(tmp_path / "srgan-bf16.shlo")
    export_generator_artifact(
        path16, gen16, variables, input_hw=(16, 16), batch=2,
        scale=4, model="srgan", platforms=("cpu",),
        compute_dtype="bfloat16",
    )
    served16 = ServedGenerator(path16)
    assert served16.meta["compute_dtype"] == "bfloat16"
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    out16 = served16(x)
    assert out16.dtype == jnp.float32
    out32 = gen.apply(variables, x, train=False)
    # bf16 rel. eps is 2^-8; activations are O(1)
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), atol=0.08,
    )


def test_native_kernels_validation():
    """`export --native-kernels` (bakes the Mosaic fused-RDB kernel)
    rejects non-ESRGAN models, tiles beyond the kernel's VMEM budget,
    and non-TPU hosts — each with an actionable message, checked
    before any checkpoint IO."""
    from argparse import Namespace

    from torchsr_tpu.infer.runner import run_export
    from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator

    base = dict(
        output="unused.shlo", checkpoint=None, tile=64, tile_batch=8,
        platforms="tpu", bf16=False, native_kernels=True,
    )
    with pytest.raises(ValueError, match="ESRGAN"):
        run_export(
            Namespace(model="srgan", **base), SRGANGenerator
        )
    with pytest.raises(ValueError, match="tiles up to"):
        run_export(
            Namespace(model="esrgan", **{**base, "tile": 256}),
            ESRGANGenerator,
        )
    # the suite runs on CPU, so the host-backend gate fires last
    with pytest.raises(RuntimeError, match="TPU host"):
        run_export(
            Namespace(model="esrgan", **base), ESRGANGenerator
        )


def test_sidecar_records_native_kernels(tiny_artifact):
    """Portable exports record native_kernels=False so serving fleets
    can tell TPU-only Mosaic artifacts from pure StableHLO ones."""
    path, _gen, _variables = tiny_artifact
    served = ServedGenerator(path)
    assert served.meta.get("native_kernels", False) is False


def test_platform_mismatch_raises_at_load(tiny_artifact, tmp_path):
    """Loading a TPU-only artifact on the wrong host fails AT LOAD with
    an actionable message (not a cryptic platform error at call time) —
    the failure mode --native-kernels artifacts hit on CPU fleets."""
    import shutil

    path, _gen, _variables = tiny_artifact
    blob = str(tmp_path / "tpu_only.shlo")
    shutil.copy(path, blob)
    meta = json.load(open(path + ".json"))
    meta["platforms"] = ["tpu"]
    meta["native_kernels"] = True
    json.dump(meta, open(blob + ".json", "w"))
    with pytest.raises(RuntimeError, match="native-kernels"):
        ServedGenerator(blob)


@pytest.mark.slow
def test_cli_export_roundtrip(image_dir, tmp_path, monkeypatch):
    """train -> export -> load artifact without the checkpoint, and
    match the CLI test-path output."""
    monkeypatch.chdir(tmp_path)
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get(
            "PYTHONPATH", ""
        ),
    }
    run = subprocess.run(
        [sys.executable, "-m", "torchsr_tpu", "train",
         "--train-dir", image_dir, "--batch-size", "8", "--epochs", "1",
         "--pretrain-epochs", "1", "--model", "srgan",
         "--crop-size", "32", "--gen-blocks", "1", "--vgg-convs", "2",
         "--disable-amp", "--skip-image-save"],
        env=env, capture_output=True, text=True, cwd=str(tmp_path),
        timeout=900,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    run = subprocess.run(
        [sys.executable, "-m", "torchsr_tpu", "export",
         str(tmp_path / "artifact.shlo"), "--model", "srgan",
         "--tile", "16", "--tile-batch", "2",
         "--platforms", "cpu"],
        env=env, capture_output=True, text=True, cwd=str(tmp_path),
        timeout=600,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    assert "Saved serving artifact" in run.stdout

    served = ServedGenerator(str(tmp_path / "artifact.shlo"))
    assert served.input_shape == (2, 16, 16, 3)
    img = np.random.default_rng(3).random((20, 24, 3)).astype(np.float32)
    out = served.upscale_image(img)
    assert out.shape == (80, 96, 3)
    assert np.all(np.isfinite(out))
