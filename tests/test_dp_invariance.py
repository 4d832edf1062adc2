"""Data-parallel invariance: the sharded train step equals 1-device math.

The DDP-replacement claim (SURVEY.md section 2.3) is that sharding the
batch over the mesh with replicated params is *numerically* the same
program as single-device training — XLA's inserted psum IS the gradient
allreduce.  This test runs one pretrain step on a 1-device and an
8-device mesh from identical initial state and compares the updated
parameters.
"""

from argparse import Namespace

import jax
import numpy as np
import pytest

from torchsr_tpu.data.synthetic import (
    SyntheticEvalLoader,
    SyntheticTrainLoader,
)
from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
from torchsr_tpu.train.trainer import SRGANTrainer


def _make(mesh):
    args = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan", num_residual=1, vgg_convs=2,
    )
    tl = SyntheticTrainLoader(8, 32, n_batches=1)
    el = SyntheticEvalLoader(8, 32, n_batches=1)
    ctx = DistributedContext(1, -1, -1, 1, False)
    return SRGANTrainer(
        args, tl, el, tl.dataset_len, el.dataset_len, mesh, ctx
    ), tl


@pytest.mark.slow
def test_pretrain_step_dp_invariant():
    results = []
    for n_dev in (1, 8):
        trainer, tl = _make(make_mesh(n_dev))
        crops, flips = next(iter(tl.epoch(0)))
        crops_dev, flips_dev = trainer._put(crops, flips)
        state, loss = trainer.pretrain_step(
            trainer.state, crops_dev, flips_dev
        )
        results.append(
            (float(loss), jax.device_get(state.gen_params))
        )

    loss1, params1 = results[0]
    loss8, params8 = results[1]
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params8)):
        np.testing.assert_allclose(a, b, atol=1e-5)
