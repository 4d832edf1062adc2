"""Convert generator param/stat trees between the unrolled and
nn.scan (fast-compile) layouts.

The unrolled towers name their blocks ``block0..block{N-1}``; the scan
towers hold ONE subtree ``blocks_scan/block/...`` whose leaves are
stacked on a leading axis.  Checkpoints are canonically stored in the
UNROLLED layout (the trainer unrolls on save and stacks on restore when
--fast-compile is active), so fast-compile checkpoints remain
interchangeable with production ones and with the reference ``.pth``
converters.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

_BLOCK_RE = re.compile(r"block(\d+)$")


def is_scan_layout(tree) -> bool:
    return "blocks_scan" in tree


def _to_plain(tree):
    """FrozenDict-or-dict -> plain nested dict (leaves untouched)."""
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def unroll_blocks(tree):
    """``blocks_scan/block`` (stacked leaves) -> ``block{i}`` subtrees.

    A no-op for trees already in the unrolled layout.
    """
    tree = _to_plain(tree)
    if not is_scan_layout(tree):
        return tree
    stacked = tree.pop("blocks_scan")["block"]
    n = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(n):
        tree[f"block{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    return tree


def stack_blocks(tree):
    """``block{i}`` subtrees -> ``blocks_scan/block`` stacked leaves.

    A no-op for trees with no ``block{i}`` entries (e.g. ESRGAN
    discriminators) or already in the scan layout.
    """
    tree = _to_plain(tree)
    names = sorted(
        (k for k in tree if _BLOCK_RE.fullmatch(str(k))),
        key=lambda k: int(_BLOCK_RE.fullmatch(str(k)).group(1)),
    )
    if not names:
        return tree
    blocks = [tree.pop(k) for k in names]
    tree["blocks_scan"] = {
        "block": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    }
    return tree
