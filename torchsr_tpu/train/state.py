"""Functional training state for the two-phase GAN recipe.

One immutable pytree holds everything the jitted train steps thread
through: generator/discriminator params + batch statistics and the three
optimizer states (the reference's psnr/gen/disc Adam trio,
srgan/trainer.py:167-196).  Learning-rate scheduling is applied by
passing the scalar LR into the step (host computes the StepLR value per
epoch), so the optimizer transform itself is stateless in the schedule.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_adam(b1: float = 0.9, b2: float = 0.999) -> optax.GradientTransformation:
    """Adam without a baked-in LR; the step multiplies by the LR scalar.

    Equivalent to ``optim.Adam(lr, betas=(0.9, 0.999))``
    (srgan/trainer.py:171-185) with the LR factored out so StepLR-style
    epoch scheduling is a host-side scalar, not optimizer state surgery.
    """
    return optax.chain(optax.scale_by_adam(b1=b1, b2=b2), optax.scale(-1.0))


def apply_updates(params, grads, opt_state, opt, lr):
    """One optimizer step at learning rate ``lr`` (a traced scalar)."""
    updates, new_opt_state = opt.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: u * lr, updates)
    return optax.apply_updates(params, updates), new_opt_state


class GANTrainState(struct.PyTreeNode):
    """Everything mutable across a training run, as one pytree."""

    gen_params: Any
    gen_stats: Any
    disc_params: Any
    disc_stats: Any
    psnr_opt_state: Any
    gen_opt_state: Any
    disc_opt_state: Any
    step: jnp.ndarray  # global optimizer step counter (int32)


def init_gan_state(
    rng: jax.Array,
    generator,
    discriminator,
    lr_shape: tuple[int, ...],
    hr_shape: tuple[int, ...],
    opt: optax.GradientTransformation,
) -> GANTrainState:
    """Initialize models and the three optimizer states.

    The whole initialization runs under ONE jit: flax ``init`` is pure,
    and running it eagerly executes thousands of tiny ops one dispatch
    at a time — ~4 ms each through this platform's tunneled runtime,
    which made cold trainer construction take minutes (measured 162 s
    -> jitted ~35 s for full ESRGAN + discriminator; a fraction of a
    second of real device work either way).
    """

    def build(rng):
        g_rng, d_rng = jax.random.split(rng)
        gen_vars = generator.init(
            g_rng, jnp.zeros(lr_shape), train=False
        )
        disc_vars = discriminator.init(
            d_rng, jnp.zeros(hr_shape), train=False
        )
        gen_params = gen_vars["params"]
        gen_stats = gen_vars.get("batch_stats", {})
        disc_params = disc_vars["params"]
        disc_stats = disc_vars.get("batch_stats", {})
        return GANTrainState(
            gen_params=gen_params,
            gen_stats=gen_stats,
            disc_params=disc_params,
            disc_stats=disc_stats,
            psnr_opt_state=opt.init(gen_params),
            gen_opt_state=opt.init(gen_params),
            disc_opt_state=opt.init(disc_params),
            step=jnp.zeros((), jnp.int32),
        )

    return jax.jit(build)(rng)


class StatePacker:
    """Flatten a state pytree into ONE flat buffer per dtype for the
    jit call boundary.

    Why this exists: every jitted call marshals each pytree leaf as a
    separate device buffer, at a per-leaf host cost (~5 us/leaf through
    this platform's tunneled runtime).  The ESRGAN ``GANTrainState``
    has 3,631 leaves (345 conv kernel/bias pairs x three Adam trees),
    and a donated NO-OP jit over it measures 17.7 ms/call — 22% of the
    entire 81 ms GAN step spent on argument marshalling, not compute
    (tools/profile_gan_step.py ``statepass``).  Packing the state into
    a handful of per-dtype mega-buffers removes that cost; inside the
    program the unpack slices fuse into the consumers (the bf16 casts
    the step already performs), and the optimizer's thousands of tiny
    per-leaf update ops become a few large fused elementwise kernels.

    The same technique underlies torch DDP's gradient buckets and
    fused optimizers; on TPU it additionally shrinks the executable's
    argument table.  (The reference passes torch module objects, where
    per-parameter dispatch is hidden by CUDA-stream asynchrony:
    /root/reference/torchsr/srgan/trainer.py:167-196.)

    ``pack``/``unpack`` are pure jnp transforms: usable inside jit
    (where they fuse) and directly (where they dispatch a handful of
    concats).  Buffer order within a dtype group is leaf order, so
    pack(unpack(b)) and unpack(pack(s)) are exact identities.
    """

    def __init__(self, template: Any):
        path_leaves, treedef = jax.tree_util.tree_flatten_with_path(
            template
        )
        self.treedef = treedef
        self._specs: list[tuple[str, int, int, tuple[int, ...]]] = []
        self._paths: list[str] = []
        sizes: dict[str, int] = {}
        for path, leaf in path_leaves:
            key = jnp.dtype(leaf.dtype).name
            size = math.prod(leaf.shape)
            off = sizes.get(key, 0)
            self._specs.append((key, off, size, tuple(leaf.shape)))
            self._paths.append(jax.tree_util.keystr(path))
            sizes[key] = off + size
        self.sizes = sizes

    @property
    def n_leaves(self) -> int:
        return len(self._specs)

    @property
    def n_buffers(self) -> int:
        return len(self.sizes)

    def pack(self, state: Any) -> dict[str, jnp.ndarray]:
        leaves = self.treedef.flatten_up_to(state)
        parts: dict[str, list] = {k: [] for k in self.sizes}
        for leaf, (key, _off, size, _shape) in zip(leaves, self._specs):
            parts[key].append(jnp.reshape(leaf, (size,)))
        return {
            key: (chunks[0] if len(chunks) == 1
                  else jnp.concatenate(chunks))
            for key, chunks in parts.items()
        }

    def unpack(self, buffers: dict[str, jnp.ndarray]) -> Any:
        leaves = [
            jnp.reshape(
                jax.lax.slice(buffers[key], (off,), (off + size,)), shape
            )
            for key, off, size, shape in self._specs
        ]
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def range_of(self, prefix: str, dtype_name: str) -> tuple[int, int]:
        """(offset, size) of the contiguous ``dtype_name`` region whose
        leaf paths start with ``prefix`` (e.g. ``.gen_params`` or
        ``.gen_opt_state[0].mu``).  Raises if no leaf matches or the
        matching leaves are not one contiguous run of the buffer —
        contiguity is what lets the packed-native optimizer treat a
        whole field as a single flat slice."""
        hits = [
            (off, size)
            for path, (key, off, size, _shape) in zip(
                self._paths, self._specs
            )
            if key == dtype_name and path.startswith(prefix)
        ]
        if not hits:
            raise KeyError(f"no {dtype_name} leaves under {prefix!r}")
        hits.sort()
        start = hits[0][0]
        end = start
        for off, size in hits:
            if off != end:
                raise ValueError(
                    f"{prefix!r} {dtype_name} leaves are not contiguous "
                    f"in the packed buffer (gap at offset {end})"
                )
            end = off + size
        return start, end - start


def flat_adam(params, grads, mu, nu, count, lr,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One Adam step over FLAT 1-D buffers — the packed-native
    optimizer.

    Bit-for-bit the math of ``make_adam`` (optax ``scale_by_adam`` with
    eps_root=0 followed by scale(-1) and the step's lr multiply), but
    executed as a handful of large fused elementwise kernels over the
    whole parameter region instead of ~2 per-leaf ops per tensor.  On
    the ESRGAN GAN step the per-leaf optimizer update dispatches ~2,000
    tiny kernels (three Adam trees over 345-conv params); at ~5-10 us
    of launch overhead each that is most of the measured ~19 ms gap
    between the step's component sum and its wall time
    (tools/profile_gan_step.py).

    Returns ``(new_params, new_mu, new_nu, new_count)``; ``count`` is
    the optax int32 step counter for bias correction.
    """
    count_inc = count + 1
    mu = b1 * mu + (1.0 - b1) * grads
    nu = b2 * nu + (1.0 - b2) * (grads * grads)
    # optax bias_correction: moment / (1 - decay**count_inc)
    c = count_inc.astype(jnp.float32)
    mu_hat = mu / (1.0 - b1 ** c)
    nu_hat = nu / (1.0 - b2 ** c)
    new_params = params - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    return new_params, mu, nu, count_inc


def grouped_apply_updates(params, grads, opt_state, lr,
                          b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8):
    """``apply_updates`` with same-shape leaves STACKED for the math.

    The per-leaf tree Adam dispatches ~2 tiny kernels per tensor; on the
    ESRGAN state (345 conv kernel/bias pairs x three trees) that is
    ~2,000 kernel launches sitting on the critical path between a
    step's backward and the next step's forward.  The ESRGAN trunk has
    only ~10 distinct parameter shapes (five RDB conv shapes x
    kernel/bias), so stacking same-shape leaves turns the update into a
    handful of large fused elementwise kernels: one multi-operand
    concatenate per group in, one contiguous leading-axis slice per
    leaf out — XLA-friendly data movement, unlike the flat-buffer
    repacks measured and rejected in round 3 (docs/benchmarks.md
    "Call-overhead anatomy").

    Bit-identical math to ``apply_updates(params, grads, opt_state,
    make_adam(), lr)``: the per-element formulas are ``flat_adam``'s
    (optax ``scale_by_adam`` + scale(-1) + lr multiply), applied over a
    stacked leading axis.  Returns ``(new_params, new_opt_state)`` with
    the optax state structure preserved.
    """
    adam_state = opt_state[0]
    count, mu, nu = adam_state.count, adam_state.mu, adam_state.nu

    p_leaves, treedef = jax.tree_util.tree_flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    mu_leaves = treedef.flatten_up_to(mu)
    nu_leaves = treedef.flatten_up_to(nu)

    groups: dict[tuple, list[int]] = {}
    for i, p in enumerate(p_leaves):
        groups.setdefault((p.shape, jnp.dtype(p.dtype).name), []).append(i)

    n = len(p_leaves)
    new_p: list = [None] * n
    new_mu: list = [None] * n
    new_nu: list = [None] * n
    for idxs in groups.values():
        if len(idxs) == 1:
            (i,) = idxs
            np_, nmu, nnu, _ = flat_adam(
                p_leaves[i], g_leaves[i], mu_leaves[i], nu_leaves[i],
                count, lr, b1, b2, eps,
            )
            new_p[i], new_mu[i], new_nu[i] = np_, nmu, nnu
        else:
            P = jnp.stack([p_leaves[i] for i in idxs])
            G = jnp.stack([g_leaves[i] for i in idxs])
            MU = jnp.stack([mu_leaves[i] for i in idxs])
            NU = jnp.stack([nu_leaves[i] for i in idxs])
            NP, NMU, NNU, _ = flat_adam(P, G, MU, NU, count, lr,
                                        b1, b2, eps)
            for k, i in enumerate(idxs):
                new_p[i], new_mu[i], new_nu[i] = NP[k], NMU[k], NNU[k]

    unflatten = jax.tree_util.tree_unflatten
    new_adam = adam_state._replace(
        count=count + 1,
        mu=unflatten(treedef, new_mu),
        nu=unflatten(treedef, new_nu),
    )
    return unflatten(treedef, new_p), (new_adam,) + tuple(opt_state[1:])


def step_lr_schedule(
    base_lr: float, epoch: int, total_epochs: int, gamma: float = 0.6
) -> float:
    """StepLR(step_size=epochs//8, gamma=0.6), stepped once per epoch.

    Reference srgan/trainer.py:186-195; ``epoch`` is 1-based and the
    scheduler has been stepped ``epoch - 1`` times at that epoch's start.
    """
    step_size = max(total_epochs // 8, 1)
    return base_lr * (gamma ** ((epoch - 1) // step_size))
