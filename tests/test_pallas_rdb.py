"""Fused Pallas RDB kernel == the flax ResidualDenseBlock, exactly.

Interpreter mode on CPU (the compiled path is exercised and A/B-benched
on real TPU by tools/bench_rdb.py; measured faster than the XLA conv
lowering — see docs/benchmarks.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.models.esrgan import ResidualDenseBlock
from torchsr_tpu.ops.pallas.rdb import fused_rdb


def _params_and_ref(x, seed=0):
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(seed), x)["params"]
    ks = tuple(params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
    bs = tuple(params[f"conv{i}"]["conv"]["bias"] for i in range(1, 6))
    return rdb.apply({"params": params}, x), ks, bs


@pytest.mark.parametrize(
    "shape",
    # incl. widths that are not sublane-tile multiples (W=12) and odd
    # spatial sizes — the shift/mask machinery must not assume
    # alignment (TPU-compiled checks: 24/20/17/31-wide all exact)
    [(2, 8, 16, 64), (1, 12, 8, 64), (2, 6, 12, 64), (1, 7, 9, 64)],
)
def test_fused_rdb_matches_flax(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, shape), jnp.float32)
    ref, ks, bs = _params_and_ref(x)
    out = fused_rdb(x, ks, bs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_fused_rdb_multi_image_blocks():
    """Several images per grid block: boundary masks must not leak
    pixels between images (biases make leakage visible)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 0.5, (4, 4, 8, 64)), jnp.float32)
    ref, ks, bs = _params_and_ref(x, seed=1)
    # nonzero biases so cross-image contamination shows up
    bs = tuple(jnp.asarray(rng.normal(0, 0.1, b.shape), jnp.float32)
               for b in bs)
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(1), x)["params"]
    for i in range(1, 6):
        params[f"conv{i}"]["conv"]["bias"] = bs[i - 1]
    ref = rdb.apply({"params": params}, x)
    out = fused_rdb(x, ks, bs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # each image's result must equal processing it alone
    solo = fused_rdb(x[1:2], ks, bs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(solo[0]), rtol=1e-5, atol=1e-5
    )


def test_fused_rdb_gradients_match_jax_grad():
    """The custom-VJP Pallas backward == jax.grad of the flax block,
    for the input, all five kernels, and all five biases."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, 64)), jnp.float32)
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(2), x)["params"]
    for i in range(1, 6):
        params[f"conv{i}"]["conv"]["bias"] = jnp.asarray(
            rng.normal(0, 0.1, params[f"conv{i}"]["conv"]["bias"].shape),
            jnp.float32,
        )
    ks = tuple(params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
    bs = tuple(params[f"conv{i}"]["conv"]["bias"] for i in range(1, 6))
    cot = jnp.asarray(rng.normal(0, 1, x.shape), jnp.float32)

    gx_r, gp_r = jax.grad(
        lambda x, p: jnp.sum(rdb.apply({"params": p}, x) * cot),
        argnums=(0, 1),
    )(x, params)
    gx_p, gk_p, gb_p = jax.grad(
        lambda x, ks, bs: jnp.sum(
            fused_rdb(x, ks, bs, interpret=True) * cot
        ),
        argnums=(0, 1, 2),
    )(x, ks, bs)

    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-5
    )
    for i in range(5):
        ref = gp_r[f"conv{i + 1}"]["conv"]
        np.testing.assert_allclose(
            np.asarray(gk_p[i]), np.asarray(ref["kernel"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gb_p[i]), np.asarray(ref["bias"]),
            rtol=1e-4, atol=1e-5,
        )


def test_fused_rdb_shard_map_matches_single_device():
    """With a mesh, the fused RDB runs under shard_map over the batch
    axis (XLA would otherwise all-gather around the Pallas call); the
    sharded outputs AND gradients must equal the single-device ones,
    including the psum'd replicated weight/bias grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 0.5, (8, 8, 8, 64)), jnp.float32)
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(4), x)["params"]
    ks = tuple(params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
    bs = tuple(params[f"conv{i}"]["conv"]["bias"] for i in range(1, 6))

    def loss(x, ks, bs, mesh=None):
        out = fused_rdb(x, ks, bs, interpret=True, mesh=mesh)
        return jnp.sum(out ** 2)

    ref = jax.grad(loss, argnums=(0, 1, 2))(x, ks, bs)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ksr = jax.device_put(ks, NamedSharding(mesh, P()))
    bsr = jax.device_put(bs, NamedSharding(mesh, P()))
    got = jax.jit(
        jax.grad(lambda x, k, b: loss(x, k, b, mesh=mesh),
                 argnums=(0, 1, 2))
    )(xs, ksr, bsr)

    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_trainer_gan_step_fused_sharded():
    """Full ESRGAN GAN step with the fused (interpret-mode) RDB kernel
    under shard_map on the 8-device mesh — the complete multi-chip
    training path for the new kernel: pretrain + GAN step, all three
    optimizers, finite losses."""
    from argparse import Namespace

    from jax.sharding import Mesh

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.parallel.mesh import DistributedContext
    from torchsr_tpu.train.trainer import ESRGANTrainer

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    args = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="esrgan", num_residual=1,
        vgg_convs=2, fused_rdb=True, pallas_interpret=True,
    )
    tl = SyntheticTrainLoader(8, 32, n_batches=1)
    el = SyntheticEvalLoader(8, 32, n_batches=1)
    tr = ESRGANTrainer(
        args, tl, el, tl.dataset_len, el.dataset_len, mesh,
        DistributedContext(1, -1, -1, 1, False),
    )
    crops, flips = next(iter(tl.epoch(0)))
    cd, fd = tr._put(crops, flips)
    tr.state, loss = tr.pretrain_step(tr.state, cd, fd)
    cd, fd = tr._put(crops, flips)
    tr.state, m = tr.gan_step(tr.state, cd, fd, 1e-4, 1e-4, tr.vgg_params)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(m["disc_loss"]))
    assert np.isfinite(float(m["gen_loss"]))


def test_fused_module_param_tree_and_forward_match():
    """ResidualDenseBlock(fused=True) has the identical param tree and
    output as the unfused module (checkpoint interchangeability)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, 64)), jnp.float32)
    plain = ResidualDenseBlock(fused=False)
    fused = ResidualDenseBlock(fused=True, pallas_interpret=True)
    p_plain = plain.init(jax.random.PRNGKey(5), x)
    p_fused = fused.init(jax.random.PRNGKey(5), x)
    assert jax.tree.structure(p_plain) == jax.tree.structure(p_fused)
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_p = plain.apply(p_plain, x)
    out_f = fused.apply(p_plain, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), rtol=1e-5, atol=1e-5
    )


def test_xla_backward_mode_matches_jax_grad():
    """TORCHSR_RDB_BWD=xla (hybrid: Pallas forward + XLA-conv backward
    from the saved feature buffer) produces the same input/kernel/bias
    gradients as jax.grad of the flax block — and as the Pallas
    backward kernel."""
    from torchsr_tpu.ops.pallas import rdb as rdb_mod

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 6, 9, 64)), jnp.float32)
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(9), x)["params"]
    for i in range(1, 6):
        params[f"conv{i}"]["conv"]["bias"] = jnp.asarray(
            rng.normal(0, 0.1, params[f"conv{i}"]["conv"]["bias"].shape),
            jnp.float32,
        )
    ks = tuple(params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
    bs = tuple(params[f"conv{i}"]["conv"]["bias"] for i in range(1, 6))
    cot = jnp.asarray(rng.normal(0, 1, x.shape), jnp.float32)

    def fused_loss(x, ks, bs):
        return jnp.sum(fused_rdb(x, ks, bs, interpret=True) * cot)

    gx_r, gp_r = jax.grad(
        lambda x, p: jnp.sum(rdb.apply({"params": p}, x) * cot),
        argnums=(0, 1),
    )(x, params)

    prev = rdb_mod.BWD_XLA
    rdb_mod.BWD_XLA = True
    jax.clear_caches()
    try:
        gx, gk, gb = jax.grad(fused_loss, argnums=(0, 1, 2))(x, ks, bs)
    finally:
        rdb_mod.BWD_XLA = prev
        jax.clear_caches()

    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_r), rtol=1e-4, atol=1e-5
    )
    for i in range(5):
        ref = gp_r[f"conv{i + 1}"]["conv"]
        np.testing.assert_allclose(
            np.asarray(gk[i]), np.asarray(ref["kernel"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gb[i]), np.asarray(ref["bias"]),
            rtol=1e-4, atol=1e-5,
        )


def test_xla_backward_matches_pallas_backward_bf16():
    """In the AMP dtype the two backward backends must agree to within
    bf16 operand rounding (both accumulate dW/db/dfeat in f32; the
    cotangents round through bf16 in both).  Pins that flipping
    TORCHSR_RDB_BWD does not change training numerics beyond dtype
    noise."""
    from torchsr_tpu.ops.pallas import rdb as rdb_mod

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 6, 8, 64)), jnp.bfloat16)
    ks = tuple(
        jnp.asarray(
            rng.normal(0, 0.05, (3, 3, rdb_mod._CIN[i], rdb_mod._COUT[i])),
            jnp.float32,
        )
        for i in range(5)
    )
    bs = tuple(
        jnp.asarray(rng.normal(0, 0.05, (rdb_mod._COUT[i],)), jnp.float32)
        for i in range(5)
    )
    cot = jnp.asarray(rng.normal(0, 1, x.shape), jnp.float32)

    def grads():
        return jax.grad(
            lambda x, ks, bs: jnp.sum(
                fused_rdb(x, ks, bs, interpret=True).astype(jnp.float32)
                * cot
            ),
            argnums=(0, 1, 2),
        )(x, ks, bs)

    prev = rdb_mod.BWD_XLA
    try:
        rdb_mod.BWD_XLA = True
        jax.clear_caches()
        gh = grads()
        rdb_mod.BWD_XLA = False
        jax.clear_caches()
        gp = grads()
    finally:
        rdb_mod.BWD_XLA = prev
        jax.clear_caches()

    for a, b in zip(jax.tree.leaves(gh), jax.tree.leaves(gp)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        assert rel < 0.02, rel


def test_ext_kernel_matches_slot_kernel_and_grads():
    """The extended-row-buffer variant (`_rdb_fwd_kernel_ext`; a
    measured performance negative, default OFF, kept selectable via
    TORCHSR_RDB_EXT=1 for future-toolchain re-evaluation) matches the
    3-slot kernel and jax.grad exactly on an eligible shape
    (single-image-per-block, width % 16 == 0).  Width 16 rows the GEMM
    operand offsets onto the sublane tile; nonzero biases make any
    pad-row leakage visible."""
    from torchsr_tpu.ops.pallas import rdb as rdb_mod

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 6, 16, 64)), jnp.float32)
    prev = rdb_mod.EXT_KERNEL
    rdb_mod.EXT_KERNEL = True
    jax.clear_caches()
    assert rdb_mod._ext_eligible(6 * 16, 16)
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(7), x)["params"]
    for i in range(1, 6):
        params[f"conv{i}"]["conv"]["bias"] = jnp.asarray(
            rng.normal(0, 0.1, params[f"conv{i}"]["conv"]["bias"].shape),
            jnp.float32,
        )
    ks = tuple(params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
    bs = tuple(params[f"conv{i}"]["conv"]["bias"] for i in range(1, 6))
    cot = jnp.asarray(rng.normal(0, 1, x.shape), jnp.float32)

    def fused_loss(x, ks, bs):
        return jnp.sum(fused_rdb(x, ks, bs, interpret=True) * cot)

    try:
        out_ext = fused_rdb(x, ks, bs, interpret=True)
        gx_e, gk_e, gb_e = jax.grad(
            fused_loss, argnums=(0, 1, 2)
        )(x, ks, bs)

        rdb_mod.EXT_KERNEL = False
        # clear so the jit cache cannot serve the ext trace
        jax.clear_caches()
        out_slot = fused_rdb(x, ks, bs, interpret=True)
        gx_s, gk_s, gb_s = jax.grad(
            fused_loss, argnums=(0, 1, 2)
        )(x, ks, bs)
    finally:
        rdb_mod.EXT_KERNEL = prev
        jax.clear_caches()

    np.testing.assert_allclose(
        np.asarray(out_ext), np.asarray(out_slot), rtol=1e-5, atol=1e-5
    )
    ref = rdb.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out_ext), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gx_e), np.asarray(gx_s), rtol=1e-5, atol=1e-5
    )
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(gk_e[i]), np.asarray(gk_s[i]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gb_e[i]), np.asarray(gb_s[i]),
            rtol=1e-5, atol=1e-5,
        )


def test_fwd_only_cap_gating(monkeypatch):
    """train=False (inference) unlocks the forward-only tile cap;
    train=True keeps the fwd+bwd cap (round 4: 128px inference tiles)."""
    from torchsr_tpu.models.esrgan import _use_fused_rdb
    from torchsr_tpu.ops.pallas import rdb as rdb_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    big = jnp.zeros((1, 128, 128, 64))   # 16384 rows
    small = jnp.zeros((1, 64, 64, 64))   # 4096 rows
    assert _use_fused_rdb(None, small, fwd_only=False)
    assert _use_fused_rdb(None, small, fwd_only=True)
    assert not _use_fused_rdb(None, big, fwd_only=False)
    assert _use_fused_rdb(None, big, fwd_only=True)
    huge = jnp.zeros((1, 176, 176, 64))  # > fwd cap as well
    assert not _use_fused_rdb(None, huge, fwd_only=True)
    # explicit flag still overrides the auto gate
    assert _use_fused_rdb(True, huge, fwd_only=False)
    # VMEM tier selection: fwd-only 16384-row blocks get the top tier
    p = rdb_mod._compiler_params(16384, 2, 2 * rdb_mod._MAX_BLOCK_ROWS)
    assert p.vmem_limit_bytes == rdb_mod._VMEM_TIERS[-1][1]
    p = rdb_mod._compiler_params(4096, 2, 2 * rdb_mod._MAX_BLOCK_ROWS)
    assert p.vmem_limit_bytes == rdb_mod._VMEM_TIERS[0][1]
    assert rdb_mod._compiler_params(
        2048, 2, 2 * rdb_mod._MAX_BLOCK_ROWS) is None


def test_fused_rdb_big_single_image_block():
    """A single image above the fwd+bwd row cap (the round-4
    forward-only path, e.g. a 128px inference tile) still matches the
    flax reference exactly — one image per grid step, interpret mode
    (on TPU the same block shape runs compiled under the raised VMEM
    tier; measured in tools/bench_inference.py)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 72, 72, 64)), jnp.float32)
    ref, ks, bs = _params_and_ref(x)
    out = fused_rdb(x, ks, bs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_ilv_kernel_matches_slot_kernel():
    """The chunk-interleaved forward kernel (`_rdb_fwd_kernel_ilv`,
    round 5 — a MEASURED NEGATIVE at the serving shape, default OFF,
    kept selectable via TORCHSR_RDB_ILV=1) and the 3-slot kernel
    produce identical results; both match flax.  Odd width +
    multi-image block exercises the per-chunk boundary stripes;
    nonzero biases make any leakage visible."""
    from torchsr_tpu.ops.pallas import rdb as rdb_mod

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 0.5, (3, 5, 9, 64)), jnp.float32)
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(11), x)["params"]
    for i in range(1, 6):
        params[f"conv{i}"]["conv"]["bias"] = jnp.asarray(
            rng.normal(0, 0.1, params[f"conv{i}"]["conv"]["bias"].shape),
            jnp.float32,
        )
    ks = tuple(params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
    bs = tuple(params[f"conv{i}"]["conv"]["bias"] for i in range(1, 6))
    ref = rdb.apply({"params": params}, x)

    prev = rdb_mod.ILV_KERNEL
    try:
        rdb_mod.ILV_KERNEL = True
        jax.clear_caches()
        out_ilv = fused_rdb(x, ks, bs, interpret=True)
        rdb_mod.ILV_KERNEL = False
        jax.clear_caches()
        out_slot = fused_rdb(x, ks, bs, interpret=True)
    finally:
        rdb_mod.ILV_KERNEL = prev
        jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(out_ilv), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # one dot vs three summed dots: K-dim reduction order differs, so
    # agreement is to the ulp, not bitwise
    np.testing.assert_allclose(
        np.asarray(out_ilv), np.asarray(out_slot), rtol=0, atol=5e-7
    )
