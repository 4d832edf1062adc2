"""Multi-step scan programs (K training steps per jitted call).

The production epoch loops run `lax.scan` over a stacked batch axis to
amortize per-call dispatch (~4.5 ms through the tunneled runtime; 38%
of an SRGAN pretrain step).  These tests pin:

- K scanned steps == K sequential single-step calls (same bodies, so
  equality is exact up to scan's fusion jitter);
- the stacked prefetch groups full chunks and routes the ragged tail
  through single batches;
- the epoch loop integration end-to-end (multi chunks + tail) keeps a
  finite, advancing state.
"""

from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.data.loader import initialize_datasets
from torchsr_tpu.data.prefetch import prefetch_to_device_stacked
from torchsr_tpu.parallel.mesh import (
    DistributedContext,
    make_mesh,
    put_stacked_batch,
    replicate,
)


def _tiny_trainer(image_dir, model, **extra):
    from torchsr_tpu.registry import select_trainer_model

    base = dict(
        batch_size=8, data_workers=2, dataset_multiplier=1,
        disable_amp=True, epochs=1, gan_checkpoint=None,
        master_addr=None, master_port=None, model=model,
        pretrain_epochs=1, psnr_checkpoint=None, seed=5,
        skip_image_save=True, train_dir="", num_residual=1,
        vgg_convs=2,
    )
    base.update(extra)
    args = Namespace(**base)
    trainer_cls, _crop = select_trainer_model(args)
    loaders = initialize_datasets(
        image_dir, batch_size=8, crop_size=32,
        dataset_multiplier=args.dataset_multiplier, workers=2, seed=5,
    )
    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    return trainer_cls(args, *loaders, mesh, ctx)


@pytest.mark.parametrize("model", ["srgan", "esrgan"])
def test_multi_step_matches_sequential_steps(image_dir, model):
    trainer = _tiny_trainer(image_dir, model, dataset_multiplier=2)
    host_batches = [tuple(b) for b in trainer.train_loader.epoch(0)][:2]
    assert len(host_batches) == 2
    stacked = tuple(
        np.stack([b[i] for b in host_batches]) for i in range(2)
    )
    crops_k, flips_k = put_stacked_batch(stacked, trainer.mesh)

    host0 = jax.device_get(trainer.state)

    # sequential single steps (donated; rebuild after)
    s1 = trainer.state
    seq_pre = []
    for c, f in host_batches:
        cd, fd = trainer._put(c, f)
        s1, loss = trainer.pretrain_step(s1, cd, fd)
        seq_pre.append(float(loss))
    cd, fd = trainer._put(*host_batches[0])
    s1, m1 = trainer.gan_step(s1, cd, fd, 1e-4, 1e-4, trainer.vgg_params)

    s2 = replicate(host0, trainer.mesh)
    s2, losses = trainer.pretrain_step_multi(s2, crops_k, flips_k)
    stacked1 = tuple(
        np.stack([host_batches[0][i]]) for i in range(2)
    )
    ck1, fk1 = put_stacked_batch(stacked1, trainer.mesh)
    s2, m2 = trainer.gan_step_multi(
        s2, ck1, fk1, 1e-4, 1e-4, trainer.vgg_params
    )

    assert losses.shape == (2,)
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_pre), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        float(m1["gen_loss"]), float(m2["gen_loss"][0]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(m1["disc_loss"]), float(m2["disc_loss"][0]),
        rtol=1e-5, atol=1e-6,
    )
    flat1 = jax.tree_util.tree_leaves(jax.device_get(s1))
    flat2 = jax.tree_util.tree_leaves(jax.device_get(s2))
    # same bodies traced under scan: agreement up to fusion jitter,
    # with Adam's near-zero-gradient +-lr coin flips bounded (see
    # test_state_packing.py for the band rationale)
    lr = 1e-4
    n_loose = 0
    n_total = 0
    for a, b in zip(flat1, flat2):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        diff = np.abs(a - b)
        n_loose += int(np.sum(diff > 1e-5 + 1e-3 * np.abs(b)))
        n_total += diff.size
        assert np.all(diff <= 2.5 * lr + 1e-3 * np.abs(b))
    assert n_loose / n_total < 0.005


def test_stacked_prefetch_groups_and_tail(image_dir):
    trainer = _tiny_trainer(image_dir, "srgan", dataset_multiplier=5)
    n_batches = len(trainer.train_loader)
    assert n_batches >= 3
    k = 2
    kinds = []
    count = 0
    for kind, payload in prefetch_to_device_stacked(
        trainer.train_loader.epoch(0), trainer.mesh, k
    ):
        kinds.append(kind)
        if kind == "multi":
            assert payload[0].shape[0] == k
            count += k
        else:
            count += 1
    assert count == n_batches
    assert kinds.count("multi") == n_batches // k
    assert kinds.count("single") == n_batches % k
    # full-group-first ordering: every multi precedes the tail singles
    if "single" in kinds:
        assert kinds.index("single") > kinds.index("multi")


def test_stacked_prefetch_k1_disables_fusion(image_dir):
    """--steps-per-call 1 must route every batch through the plain
    single-step jit (no stacked axis, no scan-of-1 program), so it is a
    true per-call baseline for A/B'ing the scan fusion."""
    trainer = _tiny_trainer(image_dir, "srgan", dataset_multiplier=3)
    n_batches = len(trainer.train_loader)
    kinds = [
        kind
        for kind, _ in prefetch_to_device_stacked(
            trainer.train_loader.epoch(0), trainer.mesh, 1
        )
    ]
    assert kinds == ["single"] * n_batches


@pytest.mark.slow
def test_epoch_loop_runs_multi_and_tail(image_dir, workdir):
    """Full two-phase recipe through the multi-step loops: 5 batches
    per epoch with steps_per_call=2 exercises two scan calls plus the
    single-step tail in BOTH phases."""
    trainer = _tiny_trainer(
        image_dir, "srgan", dataset_multiplier=5, steps_per_call=2,
    )
    trainer.train()
    n = len(trainer.train_loader)
    assert int(trainer.state.step) == 2 * n  # pretrain + gan epochs
    for leaf in jax.tree_util.tree_leaves(
        jax.device_get(trainer.state.gen_params)
    ):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path
