"""Checkpointing with the reference's best/latest semantics + torch interop.

Format: a single msgpack file (via flax.serialization) holding
``{"epoch", "phase", "state"}`` — the same metadata contract as the
reference (srgan/trainer.py:254-258) — plus, unlike the reference, the
full training state (discriminator, all three optimizer states, RNG
counter) under ``"extra"`` so resume is lossless.  The reference loses
discriminator/optimizer state on every resume (SURVEY.md section 5); we
restore it when present and degrade gracefully (generator-only) when
loading a converted torch checkpoint.

File naming parity: ``{model}-{phase}-{best,latest}.ckpt`` in the
working directory, mirroring the reference's ``.pth`` names.  Loading
accepts both our ``.ckpt`` and reference ``.pth`` files (the latter via
torchsr_tpu.models.torch_compat).
"""

from __future__ import annotations

import os
import threading


import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


@jax.jit
def _jit_copy(arrays: tuple) -> tuple:
    # jnp.copy lowers to a real copy HLO: without donation the outputs
    # are fresh buffers, never aliases of the inputs.
    return tuple(jnp.copy(a) for a in arrays)


def device_snapshot(tree):
    """On-device copy of every ``jax.Array`` leaf, in ONE jitted dispatch.

    Why: the trainers donate their state buffers into every jitted step,
    so a background thread cannot read the live arrays later — they may
    be deleted by the next dispatch.  An HBM->HBM copy is microseconds
    (vs ~4 ms per *dispatch* on the tunneled runtime, hence one call for
    the whole tree, not per leaf) and gives the writer thread a stable
    tree to stream out while training continues.  Non-array leaves
    (epoch ints, floats) pass through unchanged.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, leaf in enumerate(leaves) if isinstance(leaf, jax.Array)]
    if idx:
        copies = _jit_copy(tuple(leaves[i] for i in idx))
        for i, copy in zip(idx, copies):
            leaves[i] = copy
    return jax.tree_util.tree_unflatten(treedef, leaves)


class AsyncCheckpointWriter:
    """Background checkpoint writes that overlap training.

    The device->host fetch dominates checkpoint cost (measured: a full
    ESRGAN training state is ~300 MB and took 62-85+ s per fetch
    through this platform's tunnel, with high run-to-run variance —
    blocking every epoch's ``-latest``/``-best`` writes on the
    synchronous path; even on directly-attached hosts the
    fetch+serialize+fsync is the epoch loop's only non-compute stall).  ``save()`` therefore only takes an
    on-device snapshot (one jitted copy dispatch, see
    ``device_snapshot``) and enqueues; a single worker thread performs
    the fetch, serialization, and atomic write while the main thread
    keeps dispatching steps.

    Semantics:

    - **Latest-wins per path.**  If a newer save for the same file is
      enqueued before an older one started, the older job is replaced
      (its snapshot is freed immediately) — a slow sink can never make
      the queue, or device memory, grow without bound: pending device
      memory is bounded by one snapshot per distinct path plus the one
      in flight.
    - **FIFO across paths**, so a ``-best`` enqueued before a
      ``-latest`` lands first.
    - ``wait()`` blocks until everything enqueued has been written (or
      re-raises the first worker error).  Trainers call it at phase
      boundaries (the GAN phase reads the pretrain's files), on
      preemption, and at the end of ``train()``.
    - Errors are sticky: a failed write surfaces at the next ``save()``
      or ``wait()`` rather than being lost in the worker.

    Multi-host note: snapshotting runs a jitted program over the global
    mesh, so EVERY process must participate in it at the same point.
    The trainers therefore call ``device_snapshot`` on all processes
    and only the main process (which owns a writer) calls ``enqueue``
    with the result; non-main snapshots are dropped immediately.  The
    worker's ``jax.device_get`` is process-local (the training state is
    fully replicated under data parallelism), so the background stream
    never blocks on other hosts.
    """

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._pending: dict[str, tuple] = {}
        self._order: list[str] = []
        self._inflight = 0
        self._error: BaseException | None = None
        self._thread: threading.Thread | None = None

    def _check_error(self) -> None:
        with self._cond:
            err = self._error
        if err is not None:
            raise RuntimeError(
                "async checkpoint write failed"
            ) from err

    def save(
        self,
        path: str,
        epoch: int,
        phase: str,
        generator_state: dict,
        extra: dict | None = None,
        host_transform=None,
    ) -> None:
        """Snapshot on device and enqueue an atomic write of ``path``.

        ``generator_state``/``extra`` may reference the live (donated)
        training buffers — they are copied on device before this
        returns.  ``host_transform``, if given, runs in the worker on
        the fetched host generator-state (the trainers use it to
        unstack nn.scan layouts into the canonical checkpoint format).
        """
        self.enqueue(
            path,
            epoch,
            phase,
            device_snapshot(generator_state),
            device_snapshot(extra) if extra is not None else None,
            host_transform=host_transform,
        )

    def enqueue(
        self,
        path: str,
        epoch: int,
        phase: str,
        generator_snapshot: dict,
        extra_snapshot: dict | None = None,
        host_transform=None,
    ) -> None:
        """Enqueue trees already snapshotted with ``device_snapshot``.

        The multi-process entry point: every process takes the
        (collective) snapshot; only the process that owns a writer
        enqueues it.
        """
        self._check_error()
        job = (
            int(epoch),
            str(phase),
            generator_snapshot,
            extra_snapshot,
            host_transform,
        )
        with self._cond:
            if path not in self._pending:
                self._order.append(path)
            self._pending[path] = job
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._run, name="ckpt-writer", daemon=True
                )
                self._thread.start()
            self._cond.notify_all()

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._order:
                    self._cond.wait()
                path = self._order.pop(0)
                job = self._pending.pop(path)
                self._inflight += 1
            epoch, phase, gen_snap, extra_snap, host_transform = job
            try:
                gen_host = jax.device_get(gen_snap)
                if host_transform is not None:
                    gen_host = host_transform(gen_host)
                extra_host = (
                    jax.device_get(extra_snap)
                    if extra_snap is not None else None
                )
                save_checkpoint(path, epoch, phase, gen_host,
                                extra=extra_host)
            except BaseException as exc:  # surface at next save()/wait()
                with self._cond:
                    if self._error is None:
                        self._error = exc
            finally:
                with self._cond:
                    self._inflight -= 1
                    self._cond.notify_all()

    def pending(self) -> int:
        """Number of enqueued-or-in-flight checkpoint writes."""
        with self._cond:
            return len(self._order) + self._inflight

    def wait(self, log=None) -> None:
        """Block until every enqueued checkpoint is on disk.

        ``log``: optional callable for progress lines — the fetch can
        take minutes through a degraded transport, and a silent block
        is indistinguishable from a hang.
        """
        logged = False
        with self._cond:
            while self._order or self._inflight:
                # Quick drains (small states, fast hosts) stay silent;
                # only a wait that outlives the grace period logs.
                self._cond.wait(timeout=2.0)
                if (
                    log is not None and not logged
                    and (self._order or self._inflight)
                ):
                    log(
                        f"Draining {len(self._order) + self._inflight} "
                        "pending checkpoint write(s) (device->host "
                        "stream; can take minutes for large states)"
                    )
                    logged = True
        self._check_error()


def save_checkpoint(
    path: str,
    epoch: int,
    phase: str,
    generator_state: dict,
    extra: dict | None = None,
) -> None:
    """Write an atomic checkpoint file.

    ``generator_state``: ``{"params": ..., "batch_stats": ...}`` of the
    generator — the part the reference persists.  ``extra``: optional
    full-train-state payload for lossless resume.
    """
    payload = {
        "epoch": int(epoch),
        "phase": str(phase),
        "state": _to_host(generator_state),
    }
    if extra is not None:
        payload["extra"] = _to_host(extra)
    # to_state_dict converts optax namedtuple states into plain dicts so
    # the whole payload is msgpack-serializable.
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(payload)
    )
    # Unique tmp name: two writers targeting the same path (a second
    # trainer sharing the checkpoint dir) must each atomically replace,
    # never race on one shared ".tmp" (os.replace of a tmp another
    # process already consumed raises FileNotFoundError).
    tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp"
    try:
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, model: str | None = None) -> dict | None:
    """Load a checkpoint, returning None when the file doesn't exist.

    Accepts our msgpack ``.ckpt`` format or a reference torch ``.pth``
    (``{"epoch", "phase", "state": torch state_dict}``, converted on the
    fly — requires ``model`` in {srgan, esrgan} to pick the converter).
    """
    if not path or not os.path.exists(path):
        return None
    if path.endswith((".pth", ".pt")):
        return _load_torch_checkpoint(path, model)
    with open(path, "rb") as fh:
        blob = fh.read()
    try:
        return serialization.msgpack_restore(blob)
    except Exception:
        # Fall back to torch pickle with a mis-matched extension.
        return _load_torch_checkpoint(path, model)


def _load_torch_checkpoint(path: str, model: str | None) -> dict:
    from torchsr_tpu.models import torch_compat

    raw = torch_compat.load_torch_checkpoint(path)
    if isinstance(raw, dict) and "state" in raw:
        state_dict, epoch, phase = (
            raw["state"], raw.get("epoch", 1), raw.get("phase", "")
        )
    else:
        state_dict, epoch, phase = raw, 1, ""
    if isinstance(state_dict, dict):
        # BasicSR / Real-ESRGAN releases wrap the weights in
        # {"params"} or {"params_ema"} (EMA preferred when present).
        for wrapper in ("params_ema", "params"):
            inner = state_dict.get(wrapper)
            if isinstance(inner, dict) and inner:
                state_dict = inner
                break
    if model is None:
        # Infer from the keys: ESRGAN generators have (R)RDB blocks —
        # uppercase in the reference/xinntao schemes, lowercase in
        # BasicSR's.
        is_esrgan = any("rdb" in k.lower() for k in state_dict)
        model = "esrgan" if is_esrgan else "srgan"
    if model.lower() == "esrgan":
        state = torch_compat.convert_esrgan_generator(state_dict)
    else:
        state = torch_compat.convert_srgan_generator(state_dict)
    return {"epoch": int(epoch), "phase": str(phase), "state": state}


def find_checkpoint(*candidates: str) -> str | None:
    """First existing path among candidates (also tries .pth fallbacks
    for .ckpt names, so reference-produced files are picked up)."""
    for cand in candidates:
        if not cand:
            continue
        if os.path.exists(cand):
            return cand
        if cand.endswith(".ckpt"):
            alt = cand[: -len(".ckpt")] + ".pth"
            if os.path.exists(alt):
                return alt
    return None
