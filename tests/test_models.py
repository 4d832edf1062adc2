"""Model shape/dtype/parameter-count tests (small configs for CPU speed).

Parameter counts for the full configs are pinned against the reference
networks (SRGAN generator 1,547,350 / ESRGAN generator 16,697,987 params,
verified against /root/reference/torchsr/{srgan,esrgan}).
"""

import jax
import jax.numpy as jnp
import pytest

from torchsr_tpu.models import (
    ESRGANDiscriminator,
    ESRGANGenerator,
    SRGANDiscriminator,
    SRGANGenerator,
    VGG19Features,
)


def _nparams(tree):
    return sum(p.size for p in jax.tree.leaves(tree))


def test_srgan_generator_shapes():
    g = SRGANGenerator(num_residual=2)
    x = jnp.zeros((2, 8, 8, 3))
    variables = g.init(jax.random.PRNGKey(0), x, train=False)
    y = g.apply(variables, x, train=False)
    assert y.shape == (2, 32, 32, 3)
    assert y.dtype == jnp.float32
    assert "batch_stats" in variables


@pytest.mark.parametrize("scale", [2, 8])
@pytest.mark.parametrize("gen_cls", [SRGANGenerator, ESRGANGenerator])
def test_generator_scale_factor(gen_cls, scale):
    """--scale support: log2(scale) upsample stages, named upsample{i}
    so inference can re-derive the scale from any checkpoint (the
    reference hard-codes 4x; SURVEY.md section 2 #9/#14)."""
    kw = (
        {"num_residual": 1} if gen_cls is SRGANGenerator
        else {"num_rrdb_blocks": 1}
    )
    g = gen_cls(scale_factor=scale, **kw)
    x = jnp.zeros((1, 8, 8, 3))
    variables = g.init(jax.random.PRNGKey(0), x, train=False)
    y = g.apply(variables, x, train=False)
    assert y.shape == (1, 8 * scale, 8 * scale, 3)
    n_up = len(
        [k for k in variables["params"] if k.startswith("upsample")]
    )
    assert 2 ** n_up == scale


def test_srgan_generator_param_count():
    g = SRGANGenerator()
    variables = jax.eval_shape(
        lambda k: g.init(k, jnp.zeros((1, 8, 8, 3)), train=False),
        jax.random.PRNGKey(0),
    )
    assert _nparams(variables["params"]) == 1_547_350


def test_esrgan_generator_param_count():
    g = ESRGANGenerator()
    variables = jax.eval_shape(
        lambda k: g.init(k, jnp.zeros((1, 8, 8, 3)), train=False),
        jax.random.PRNGKey(0),
    )
    assert _nparams(variables["params"]) == 16_697_987


def test_esrgan_generator_shapes():
    g = ESRGANGenerator(num_rrdb_blocks=1)
    x = jnp.zeros((1, 6, 6, 3))
    variables = g.init(jax.random.PRNGKey(0), x, train=False)
    y = g.apply(variables, x, train=False)
    assert y.shape == (1, 24, 24, 3)


def test_srgan_discriminator():
    d = SRGANDiscriminator(image_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    y = d.apply(variables, x, train=False)
    assert y.shape == (2, 1)
    # sigmoid head -> probabilities
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_esrgan_discriminator_logits():
    d = ESRGANDiscriminator(image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    y = d.apply(variables, x, train=False)
    assert y.shape == (2, 1)


def test_batch_stats_update_in_train_mode():
    g = SRGANGenerator(num_residual=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    variables = g.init(jax.random.PRNGKey(0), x, train=True)
    _, mutated = g.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not jnp.allclose(a, b) for a, b in zip(old, new)
    ), "train-mode apply must update running statistics"


def test_bf16_policy():
    g = SRGANGenerator(num_residual=1, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    variables = g.init(jax.random.PRNGKey(0), x, train=False)
    # params stay f32, output returns as f32
    assert all(
        p.dtype == jnp.float32 for p in jax.tree.leaves(variables["params"])
    )
    y = g.apply(variables, x, train=False)
    assert y.dtype == jnp.float32


def test_vgg_features_shape():
    m = VGG19Features()
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    # 4 maxpools in features[:36] -> 32/16 spatial, 512 channels
    assert y.shape == (1, 2, 2, 512)
    assert _nparams(variables["params"]) == 20_024_384
