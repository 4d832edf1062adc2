"""StatePacker: flat per-dtype state buffers at the jit boundary.

On the tunneled TPU runtime each jitted call marshals every pytree leaf
separately (~5 us/leaf; the 3,631-leaf ESRGAN state measured 17.7 ms of
pure marshalling per GAN step).  The production epoch loops therefore
thread the state as a handful of packed buffers.  These tests pin:

- pack/unpack exact-identity round trips on mixed-dtype trees
  (f32/bf16/int32, scalars, empty-dict nodes — the shapes GANTrainState
  actually contains);
- the packed pretrain and GAN steps matching the per-leaf jits to
  float-fusion tolerance (same step bodies, different call boundary);
- the packed path running under the 8-device data-parallel mesh.
"""

from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.data.loader import initialize_datasets
from torchsr_tpu.data.prefetch import prefetch_to_device
from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh, replicate
from torchsr_tpu.train.state import StatePacker


def test_pack_unpack_roundtrip_mixed_dtypes():
    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": {
            "w": jnp.ones((2, 2, 2), jnp.bfloat16) * 1.5,
            "empty": {},
            "n": jnp.asarray(7, jnp.int32),
        },
        "c": [jnp.asarray(2.5, jnp.float32),
              jnp.arange(5, dtype=jnp.int32)],
    }
    packer = StatePacker(tree)
    assert packer.n_leaves == 5
    # three dtypes -> three buffers
    assert packer.n_buffers == 3
    packed = packer.pack(tree)
    assert sorted(packed) == sorted(
        jnp.dtype(d).name for d in (jnp.float32, jnp.bfloat16, jnp.int32)
    )
    out = packer.unpack(packed)
    flat_in, def_in = jax.tree_util.tree_flatten(tree)
    flat_out, def_out = jax.tree_util.tree_flatten(out)
    assert def_in == def_out
    for a, b in zip(flat_in, flat_out):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the other direction: pack(unpack(b)) == b
    repacked = packer.pack(out)
    for k in packed:
        np.testing.assert_array_equal(
            np.asarray(packed[k]), np.asarray(repacked[k])
        )


def test_pack_unpack_inside_jit():
    tree = {
        "w": jnp.arange(8, dtype=jnp.float32),
        "s": jnp.asarray(3, jnp.int32),
    }
    packer = StatePacker(tree)

    @jax.jit
    def round_trip(bufs):
        t = packer.unpack(bufs)
        t = {"w": t["w"] * 2.0, "s": t["s"] + 1}
        return packer.pack(t)

    out = packer.unpack(round_trip(packer.pack(tree)))
    np.testing.assert_array_equal(
        np.asarray(out["w"]), np.arange(8, dtype=np.float32) * 2
    )
    assert int(out["s"]) == 4


def test_flat_adam_matches_optax():
    """`flat_adam` (the packed-native fused optimizer) reproduces the
    optax chain `make_adam` + `apply_updates` step-for-step, including
    bias correction through the int32 count."""
    from torchsr_tpu.train.state import apply_updates, flat_adam, make_adam

    rng = np.random.default_rng(11)
    n = 1000
    params = jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)
    opt = make_adam()
    opt_state = opt.init(params)
    p_tree = params
    p_flat = params
    mu = jnp.zeros((n,), jnp.float32)
    nu = jnp.zeros((n,), jnp.float32)
    count = jnp.asarray(0, jnp.int32)
    for step in range(5):
        g = jnp.asarray(rng.normal(0, 10.0 ** -step, (n,)), jnp.float32)
        lr = 1e-4 * (0.6 ** step)
        p_tree, opt_state = apply_updates(p_tree, g, opt_state, opt, lr)
        p_flat, mu, nu, count = flat_adam(p_flat, g, mu, nu, count, lr)
        np.testing.assert_allclose(
            np.asarray(p_flat), np.asarray(p_tree), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_array_equal(
            np.asarray(count), np.asarray(opt_state[0].count)
        )
    np.testing.assert_allclose(
        np.asarray(mu), np.asarray(opt_state[0].mu), rtol=1e-6, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(nu), np.asarray(opt_state[0].nu), rtol=1e-6, atol=0
    )


def test_grouped_adam_matches_optax():
    """`grouped_apply_updates` (same-shape leaves stacked for the
    update math) reproduces per-leaf `apply_updates` step-for-step on a
    tree with repeated shapes, singletons, and nesting — including the
    optax state structure (count/mu/nu)."""
    from torchsr_tpu.train.state import (
        apply_updates,
        grouped_apply_updates,
        make_adam,
    )

    rng = np.random.default_rng(7)

    def tree_like(scale):
        return {
            "blocks": [
                {"kernel": jnp.asarray(rng.normal(0, scale, (3, 3, 4, 2)),
                                       jnp.float32),
                 "bias": jnp.asarray(rng.normal(0, scale, (2,)),
                                     jnp.float32)}
                for _ in range(5)
            ],
            "head": jnp.asarray(rng.normal(0, scale, (7, 3)), jnp.float32),
            "scalarish": jnp.asarray(rng.normal(0, scale, (2,)),
                                     jnp.float32),
        }

    params = tree_like(0.1)
    opt = make_adam()
    st_tree = opt.init(params)
    st_grp = opt.init(params)
    p_tree = params
    p_grp = params
    for step in range(4):
        g = tree_like(10.0 ** -step)
        lr = 1e-4 * (0.6 ** step)
        p_tree, st_tree = apply_updates(p_tree, g, st_tree, opt, lr)
        p_grp, st_grp = grouped_apply_updates(p_grp, g, st_grp, lr)
        for a, b in zip(jax.tree.leaves(p_tree), jax.tree.leaves(p_grp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9
            )
    np.testing.assert_array_equal(
        np.asarray(st_grp[0].count), np.asarray(st_tree[0].count)
    )
    for a, b in zip(
        jax.tree.leaves(st_tree[0].mu), jax.tree.leaves(st_grp[0].mu)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=0)
    for a, b in zip(
        jax.tree.leaves(st_tree[0].nu), jax.tree.leaves(st_grp[0].nu)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=0)


def test_grouped_adam_trainer_step_equivalence(image_dir, monkeypatch):
    """A full pretrain step with the grouped optimizer schedule
    (TORCHSR_ADAM=grouped) produces the same updated state as the
    per-leaf tree optimizer (CPU, tiny model).  The flag is read at
    trace time, so patching the module global before the first step
    call selects the implementation."""
    import torchsr_tpu.train.trainer as trainer_mod

    def run_step(grouped):
        monkeypatch.setattr(trainer_mod, "_ADAM_GROUPED", grouped)
        tr = _tiny_trainer(image_dir, "srgan")
        crops, flips = tr._put(*next(iter(tr.train_loader.epoch(0))))
        state, loss = tr.pretrain_step(tr.state, crops, flips)
        return jax.tree.leaves(state.gen_params), float(loss)

    leaves_t, loss_t = run_step(False)
    leaves_g, loss_g = run_step(True)
    assert loss_t == pytest.approx(loss_g, rel=1e-6)
    for a, b in zip(leaves_t, leaves_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )


def _tiny_trainer(image_dir, model):
    from torchsr_tpu.registry import select_trainer_model

    args = Namespace(
        batch_size=8, data_workers=2, dataset_multiplier=1,
        disable_amp=True, epochs=1, gan_checkpoint=None,
        master_addr=None, master_port=None, model=model,
        pretrain_epochs=1, psnr_checkpoint=None, seed=3,
        skip_image_save=True, train_dir="", num_residual=1,
        vgg_convs=2,
    )
    trainer_cls, _crop = select_trainer_model(args)
    loaders = initialize_datasets(
        image_dir, batch_size=8, crop_size=32, dataset_multiplier=1,
        workers=2, seed=3,
    )
    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    return trainer_cls(args, *loaders, mesh, ctx)


@pytest.mark.parametrize("model", ["srgan", "esrgan"])
def test_packed_steps_match_per_leaf_steps(image_dir, model):
    """Packed and per-leaf jits share the step bodies; on identical
    inputs (including the donated-state threading) their outputs must
    agree to float tolerance across a pretrain AND a GAN step."""
    trainer = _tiny_trainer(image_dir, model)
    crops, flips = next(
        iter(
            prefetch_to_device(
                trainer.train_loader.epoch(0), trainer.mesh
            )
        )
    )

    state0 = trainer.state
    host0 = jax.device_get(state0)

    # per-leaf path (donates its input: rebuild from host copy after)
    s1, loss1 = trainer.pretrain_step(state0, crops, flips)
    s1, m1 = trainer.gan_step(
        s1, crops, flips, 1e-4, 1e-4, trainer.vgg_params
    )

    state0b = replicate(host0, trainer.mesh)
    p = trainer.pack_state(state0b)
    p, loss2 = trainer.pretrain_step_packed(p, crops, flips)
    p, m2 = trainer.gan_step_packed(
        p, crops, flips, 1e-4, 1e-4, trainer.vgg_params
    )
    s2 = trainer.unpack_state(p)

    # rtol 5e-6: the two programs fuse the one-pass BN sibling
    # reductions (layers._TorchBN, round 4) with different tilings, so
    # scalar losses can differ by a few f32 ulps of accumulated
    # rounding (observed 1.7e-6 relative on the ESRGAN gen loss).
    np.testing.assert_allclose(
        float(loss1), float(loss2), rtol=5e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        float(m1["gen_loss"]), float(m2["gen_loss"]), rtol=5e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        float(m1["disc_loss"]), float(m2["disc_loss"]),
        rtol=5e-6, atol=1e-6,
    )
    flat1 = jax.tree_util.tree_flatten_with_path(jax.device_get(s1))[0]
    flat2 = jax.tree_util.tree_flatten_with_path(jax.device_get(s2))[0]
    assert len(flat1) == len(flat2)
    # Not bit-identical: the packed program fuses the optimizer update
    # into the pack concat, reassociating a few float ops.  Adam's
    # update is sign-like in the gradient (~lr*g/(|g|+eps)), so an
    # element whose gradient sits inside the fusion-noise band takes a
    # +-lr coin-flip step decided by that noise (the same effect
    # test_step_parity.py:195-201 handles for torch comparisons).
    # Bounds by leaf kind: PARAMS/STATS are lr-scale — two sequential
    # steps (pretrain + gan) of ~+-lr sign-like Adam moves bound two
    # runs' divergence by 4*lr.  OPTIMIZER MOMENTS scale with the
    # gradient itself, not lr (mu ~ 0.1*g), and the GAN-step gradient
    # is chaotic enough at random init that fusion-level rounding
    # amplifies to ~1e-3 there (observed 2.05e-3 with the round-4
    # one-pass BN fusions) — bounded absolutely well below any
    # structural-divergence scale.  Nearly all elements must still
    # agree tightly (global two-band check).
    lr = 1e-4
    n_loose = 0
    n_total = 0
    for (path, a), (_, b) in zip(flat1, flat2):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        diff = np.abs(a - b)
        tight = diff <= 1e-5 + 1e-3 * np.abs(b)
        n_loose += int(np.sum(~tight))
        n_total += tight.size
        keystr = jax.tree_util.keystr(path)
        if "opt_state" in keystr:
            bound = 1e-2 + 1e-3 * np.abs(b)
        else:
            bound = 4.0 * lr + 1e-3 * np.abs(b)
        assert np.all(diff <= bound), (
            f"{keystr}: max diff {diff.max():.3e} exceeds its bound"
        )
    # the coin-flip population must stay rare GLOBALLY (tiny bias
    # tensors can have a few flips each without structural divergence)
    assert n_loose / n_total < 0.005, (
        f"{n_loose}/{n_total} elements outside the tight band"
    )


def test_packed_state_survives_epoch_boundary(image_dir):
    """pack -> N steps -> unpack keeps a valid, finite state whose
    step counter advanced (the epoch-loop contract)."""
    trainer = _tiny_trainer(image_dir, "srgan")
    packed = trainer.pack_state(trainer.state)
    n = 0
    # the tiny dataset yields one batch per epoch: span two epochs
    for ep in (0, 1):
        for crops, flips in prefetch_to_device(
            trainer.train_loader.epoch(ep), trainer.mesh
        ):
            packed, loss = trainer.pretrain_step_packed(
                packed, crops, flips
            )
            n += 1
    state = trainer.unpack_state(packed)
    assert int(state.step) == n
    assert n >= 2
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(
        jax.device_get(state.gen_params)
    ):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
