"""Round trip: flax variables -> torch state_dict -> flax, numerically
identical — and the exported state_dict matches the reference layout
(validated by running it through the torch replica architectures)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator
from torchsr_tpu.models.torch_compat import (
    convert_esrgan_generator,
    convert_srgan_generator,
    export_esrgan_generator,
    export_srgan_generator,
)


def test_srgan_export_roundtrip_and_torch_load():
    from tests.test_reference_parity import _TorchSRGANGen, N_BLOCKS

    gen = SRGANGenerator(num_residual=N_BLOCKS)
    x = jnp.asarray(np.random.default_rng(0).random((1, 8, 8, 3)),
                    jnp.float32)
    variables = gen.init(jax.random.PRNGKey(1), x, train=False)

    sd = export_srgan_generator(variables)
    # the exported dict loads into the reference-layout torch model
    tmodel = _TorchSRGANGen()
    tmodel.load_state_dict(sd)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    ours = gen.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                               rtol=1e-3)

    # and converts back identically
    back = convert_srgan_generator(sd)
    for a, b in zip(
        jax.tree.leaves(variables["params"]),
        jax.tree.leaves(back["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)


def test_esrgan_export_roundtrip():
    gen = ESRGANGenerator(num_rrdb_blocks=1)
    x = jnp.zeros((1, 8, 8, 3))
    variables = gen.init(jax.random.PRNGKey(2), x, train=False)
    sd = export_esrgan_generator(variables)
    back = convert_esrgan_generator(sd)
    for a, b in zip(
        jax.tree.leaves(variables["params"]),
        jax.tree.leaves(back["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)
