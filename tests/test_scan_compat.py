"""Fast-compile (nn.scan) towers == unrolled towers, exactly.

The scan layout exists for compile time (--fast-compile); identical
math and convertible params are what make it safe to mix with
production checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator
from torchsr_tpu.models.scan_compat import stack_blocks, unroll_blocks


def test_srgan_scan_matches_unrolled():
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 12, 12, 3)), jnp.float32
    )
    plain = SRGANGenerator(num_residual=3)
    scan = SRGANGenerator(num_residual=3, scan_blocks=True)
    v = plain.init(jax.random.PRNGKey(0), x, train=True)
    vs = {
        "params": stack_blocks(v["params"]),
        "batch_stats": stack_blocks(v["batch_stats"]),
    }

    # eval mode: deterministic forward
    out_p = plain.apply(v, x, train=False)
    out_s = scan.apply(vs, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p), rtol=1e-5, atol=1e-5
    )

    # train mode: outputs AND updated batch stats agree
    out_p, upd_p = plain.apply(v, x, train=True, mutable=["batch_stats"])
    out_s, upd_s = scan.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p), rtol=1e-5, atol=1e-5
    )
    unrolled_stats = unroll_blocks(upd_s["batch_stats"])
    for pa, a in jax.tree_util.tree_flatten_with_path(
        upd_p["batch_stats"]
    )[0]:
        b = a
        sub = unrolled_stats
        for k in pa:
            sub = sub[k.key]
        np.testing.assert_allclose(
            np.asarray(sub), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_esrgan_scan_matches_unrolled():
    x = jnp.asarray(
        np.random.default_rng(1).random((1, 12, 12, 3)), jnp.float32
    )
    plain = ESRGANGenerator(num_rrdb_blocks=2)
    scan = ESRGANGenerator(num_rrdb_blocks=2, scan_blocks=True)
    v = plain.init(jax.random.PRNGKey(1), x, train=False)
    vs = {"params": stack_blocks(v["params"])}
    out_p = plain.apply(v, x, train=False)
    out_s = scan.apply(vs, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p), rtol=1e-5, atol=1e-5
    )


def test_stack_unroll_roundtrip():
    plain = SRGANGenerator(num_residual=2)
    x = jnp.zeros((1, 8, 8, 3))
    v = plain.init(jax.random.PRNGKey(2), x, train=False)
    p = v["params"]
    rt = unroll_blocks(stack_blocks(p))
    assert jax.tree.structure(rt) == jax.tree.structure(
        jax.tree.map(lambda a: a, dict(p))
    ) or sorted(map(str, rt)) == sorted(map(str, dict(p)))
    for pa, a in jax.tree_util.tree_flatten_with_path(p)[0]:
        sub = rt
        for k in pa:
            sub = sub[k.key]
        np.testing.assert_array_equal(np.asarray(sub), np.asarray(a))
    # no-op on trees without block{i} entries
    d = {"conv": {"kernel": jnp.zeros((3,))}}
    assert stack_blocks(d) == unroll_blocks(d) == d
