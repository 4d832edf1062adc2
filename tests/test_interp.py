"""Network interpolation (torchsr interp): ESRGAN paper sec. 3.4.

The reference trains the two checkpoints interpolation needs
({model}-psnr-best, {model}-gan-best; reference srgan/trainer.py:321-327)
but has no blending tool; torchsr_tpu adds one (utils/interp.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.cli import main, parse_args
from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator
from torchsr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from torchsr_tpu.utils.interp import (
    interpolate_checkpoints,
    interpolate_states,
)


def _tiny_state(model, seed):
    if model == "esrgan":
        gen = ESRGANGenerator(num_rrdb_blocks=1)
    else:
        gen = SRGANGenerator(num_residual=1)
    x = jnp.zeros((1, 8, 8, 3))
    variables = gen.init(jax.random.PRNGKey(seed), x, train=False)
    return gen, jax.tree.map(np.asarray, dict(variables))


def _max_leaf_err(tree_a, tree_b):
    errs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        tree_a, tree_b,
    )
    return max(jax.tree.leaves(errs))


def test_interpolate_states_is_leafwise_lerp():
    _, s0 = _tiny_state("esrgan", 0)
    _, s1 = _tiny_state("esrgan", 1)
    alpha = 0.8
    blended = interpolate_states(s0, s1, alpha)
    expected = jax.tree.map(
        lambda a, b: (1 - alpha) * np.asarray(a, np.float32)
        + alpha * np.asarray(b, np.float32),
        s0, s1,
    )
    assert _max_leaf_err(blended, expected) < 1e-6
    # endpoints are exact
    assert _max_leaf_err(interpolate_states(s0, s1, 0.0), s0) == 0.0
    assert _max_leaf_err(interpolate_states(s0, s1, 1.0), s1) == 0.0


def test_interpolate_states_structure_mismatch_raises():
    _, esr = _tiny_state("esrgan", 0)
    _, srg = _tiny_state("srgan", 0)
    with pytest.raises(ValueError, match="tree"):
        interpolate_states(esr, srg, 0.5)


def test_interp_cli_end_to_end(tmp_path, monkeypatch):
    """torchsr interp blends two saved checkpoints; the output is a
    standard checkpoint (loadable, forward runs, BN stats blended)."""
    monkeypatch.chdir(tmp_path)
    # SRGAN: its generator carries BatchNorm running stats, covering the
    # batch_stats branch of the blend.
    gen, s0 = _tiny_state("srgan", 0)
    _, s1 = _tiny_state("srgan", 1)
    save_checkpoint("srgan-psnr-best.ckpt", 3, "psnr", s0)
    save_checkpoint("srgan-gan-best.ckpt", 7, "gan", s1)

    main([
        "interp", "srgan-psnr-best.ckpt", "srgan-gan-best.ckpt",
        "--model", "srgan", "--alpha", "0.25",
    ])
    ckpt = load_checkpoint("srgan-interp-0.25.ckpt")
    assert ckpt is not None
    assert ckpt["phase"] == "interp"
    assert ckpt["epoch"] == 7

    expected = interpolate_states(s0, s1, 0.25)
    assert _max_leaf_err(ckpt["state"], expected) < 1e-6

    # The blended generator runs and produces finite 4x output.
    x = jnp.linspace(0, 1, 8 * 8 * 3).reshape(1, 8, 8, 3)
    out = gen.apply(
        jax.tree.map(jnp.asarray, ckpt["state"]), x, train=False
    )
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_interp_default_output_name_and_alpha():
    args = parse_args([
        "interp", "a.ckpt", "b.ckpt",
    ])
    assert args.function == "interp"
    assert args.alpha == 0.8  # the ESRGAN paper's recommended default
    assert args.output is None
    assert args.model == "ESRGAN"


def test_interp_missing_input_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        interpolate_checkpoints(
            str(tmp_path / "nope.ckpt"), str(tmp_path / "also-nope.ckpt"),
            0.5, str(tmp_path / "out.ckpt"),
        )
