"""Production serving for counterfactual generation.

Beyond-parity component: the reference ships batch evaluation scripts only
(`evaluate_counterfactuals.py`, `visualize_counterfactuals.py`); this module
packages the same model path for deployment on TPU serving hosts:

- **checkpoint -> callable**: :meth:`CounterfactualServer.from_config` loads
  the trained classifier + CounterfactualVQVAE exactly like the evaluation
  entry points (train_w_autoencoder.load_models).
- **shape-bucketed compile cache**: requests are padded to the next batch
  bucket, so XLA traces/compiles once per bucket and every later call is a
  cache hit — no recompiles in steady state, bounded compile count up front
  (optionally eagerly via :meth:`warmup`).
- **microbatching**: single-cloud requests accumulate (`submit`/`flush`)
  and run as one device batch.  The encoder's per-point kernel costs
  amortise with batch (see BASELINE.md serving measurements: batch-64 is
  substantially cheaper per sample than batch-16).
- **optional bf16 weight cast**: halves HBM weight traffic; matmuls then
  run bf16xf32 on the MXU.  Opt-in because it perturbs logits/recon at the
  1e-2 relative level.
- per-sample ``target_dim`` / ``target_value``: mixed requests batch
  together (the model's one-hot interpolation broadcasts per row).
- **batching-invariant determinism**: the decoder's sampling scaffold is
  derived per request from ``sampling_seed`` (default 0), not from a
  batch-shaped RNG draw — the same request returns the same output no
  matter how it is padded, chunked, or microbatched with others.
- **async pipelining**: :meth:`counterfactual_async` dispatches the device
  work and schedules the device->host copy without blocking, returning a
  :class:`ServeFuture`; a serving loop that keeps >= 2 requests in flight
  overlaps one request's host pad/fetch (expensive over the remote-TPU
  tunnel) with the previous request's device compute.  The synchronous
  :meth:`counterfactual` is exactly ``counterfactual_async(...).result()``,
  and oversize batches pipeline their bucket-size chunks internally.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pccf.data.structures import Inputs

Array = jax.Array

_DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


class ServeFuture:
    """Handle for an in-flight counterfactual request.

    The device execution and the device->host copy are already scheduled
    (``copy_to_host_async``); :meth:`result` only waits for them and
    assembles the ``(n, n_out, 3)`` float32 array.  Results from chunked
    oversize requests concatenate in request order."""

    def __init__(self, parts: list[tuple[Array, int]]) -> None:
        self._parts = parts  # [(device recon incl. padding, valid n), ...]

    def result(self) -> np.ndarray:
        outs = [np.asarray(r[:n], np.float32) for r, n in self._parts]
        return outs[0] if len(outs) == 1 else np.concatenate(outs)


def _next_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(buckets[-1])


def _pad_batch(x: np.ndarray, b: int) -> np.ndarray:
    if x.shape[0] == b:
        return x
    pad = [(0, b - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


class CounterfactualServer:
    """Serve counterfactual generation (and classification) from checkpoints.

    Parameters
    ----------
    vqvae, classifier:
        `pccf.train.Model` wrappers holding trained variables.  The
        classifier is optional — without it, callers must pass ``logits``.
    buckets:
        ascending batch buckets; a request batch pads to the smallest
        bucket that fits (oversize batches run in bucket-size chunks).
    cast_bf16:
        cast float32 params to bfloat16 for serving.
    mesh:
        optional ``jax.sharding.Mesh`` for data-parallel serving: weights
        replicate over the mesh, request batches shard along the data axis,
        and GSPMD partitions the decode across chips.  Buckets must be
        divisible by the mesh's data-axis size.
    """

    def __init__(
        self,
        vqvae,
        classifier=None,
        buckets: Sequence[int] = _DEFAULT_BUCKETS,
        cast_bf16: bool = False,
        seed: int = 0,
        mesh=None,
    ) -> None:
        if not buckets or list(buckets) != sorted(set(int(b) for b in buckets)):
            raise ValueError(f'buckets must be ascending and unique, got {buckets}')
        self.buckets = tuple(int(b) for b in buckets)
        self.mesh = mesh
        if mesh is not None:
            from pccf.dist.mesh import DATA_AXIS

            dp = dict(mesh.shape).get(DATA_AXIS, mesh.devices.size)
            bad = [b for b in self.buckets if b % dp]
            if bad:
                raise ValueError(
                    f'buckets {bad} are not divisible by the {dp}-way data axis'
                )
        self._vq_module = vqvae.module
        self._vq_vars = self._cast(vqvae.variables) if cast_bf16 else vqvae.variables
        self._cls_module = classifier.module if classifier is not None else None
        self._cls_vars = (
            (self._cast(classifier.variables) if cast_bf16 else classifier.variables)
            if classifier is not None
            else None
        )
        if mesh is not None:
            from pccf.dist.mesh import replicate

            self._vq_vars = replicate(self._vq_vars, mesh)
            if self._cls_vars is not None:
                self._cls_vars = replicate(self._cls_vars, mesh)
        self._queue: list[tuple[int, np.ndarray, np.ndarray | None, int, float, int]] = []
        self._next_ticket = 0
        import threading

        # guards ticket minting + queue mutation: flush() explicitly supports
        # submits landing from other threads while device work is in flight
        self._queue_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.stats: dict[str, Any] = {'served': 0, 'batches': 0, 'padded': 0}

        import functools

        # kept for pccf.export: the exported counterfactual reproduces the
        # same base_key/fold_in determinism structure from this seed
        self.seed = int(seed)
        base_key = jax.random.key(seed)
        n_out = int(self._vq_module.n_inference_output_points)
        sample_dim = int(self._vq_module.decoder.sample_dim)

        def _gen_body(variables, cloud, logits, target_dim, target_value, seeds, *, mutable):
            # per-request decoder scaffold: fold the request seed, not a
            # batch-shaped draw, so outputs are pad/chunk/batch invariant
            init_s = jax.vmap(
                lambda s: jax.random.normal(
                    jax.random.fold_in(base_key, s), (n_out, sample_dim)
                )
            )(seeds)
            out = self._vq_module.apply(
                variables,
                Inputs(cloud=cloud, initial_sampling=init_s),
                logits,
                target_dim,
                target_value,
                method='generate_counterfactual',
                mutable=mutable,
            )
            if mutable:
                out, mutated = out
                return out.recon, mutated
            return out.recon

        self._gen = jax.jit(functools.partial(_gen_body, mutable=False))
        # first-call variant: additionally returns the 'packed' collection
        # (fused transformer-stack operands) so later calls — any bucket —
        # skip the per-call weight repacking (see w_networks._packed_stack)
        self._gen_prepack = jax.jit(functools.partial(_gen_body, mutable=['packed']))
        self._prepacked = False

        @functools.partial(jax.jit, static_argnames=('batch_size',))
        def _sample(variables, z1_bias, probs, sample_seed, chunk, *, batch_size):
            # two-level fold: (seed, chunk) — chunk seeds from one call can
            # never collide with another call's user seeds
            rngs = {'sampling': jax.random.fold_in(jax.random.fold_in(base_key, sample_seed), chunk)}
            out = self._vq_module.apply(
                variables, batch_size, None, z1_bias, probs,
                method='generate', rngs=rngs,
            )
            return out.recon

        self._sample = _sample

        if self._cls_module is not None:

            @jax.jit
            def _cls(variables, cloud):
                return self._cls_module.apply(variables, Inputs(cloud=cloud), train=False)

            self._cls = _cls

    def _put(self, batch):
        """Shard padded request arrays over the mesh's data axis (no-op
        single-chip)."""
        if self.mesh is None:
            return batch
        from pccf.dist.mesh import shard_batch

        return shard_batch(batch, self.mesh, strict=True)

    @staticmethod
    def _cast(variables):
        return jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            variables,
        )

    @classmethod
    def from_config(cls, cfg, **kwargs) -> 'CounterfactualServer':
        """Build from a composed config: loads both checkpoints like the
        evaluation entry points (train_w_autoencoder.load_models)."""
        from train_w_autoencoder import load_models

        classifier, vqvae = load_models(cfg)
        return cls(vqvae, classifier, **kwargs)

    # ------------------------------------------------------------- direct
    def classify(self, clouds: np.ndarray) -> np.ndarray:
        """Logits for a batch of clouds (bucketed like generation)."""
        if self._cls_module is None:
            raise ValueError('server built without a classifier')
        clouds = np.asarray(clouds, np.float32)
        b = _next_bucket(clouds.shape[0], self.buckets)
        if clouds.shape[0] > b:  # oversize: chunk
            return np.concatenate(
                [self.classify(clouds[i : i + b]) for i in range(0, clouds.shape[0], b)]
            )
        out = self._cls(self._cls_vars, self._put(_pad_batch(clouds, b)))
        return np.asarray(out[: clouds.shape[0]], np.float32)

    def counterfactual(
        self,
        clouds: np.ndarray,
        target_dim: int | np.ndarray,
        logits: np.ndarray | None = None,
        target_value: float | np.ndarray = 1.0,
        sampling_seed: int | np.ndarray = 0,
    ) -> np.ndarray:
        """Counterfactual reconstructions ``(B, n_out, 3)`` for a batch.

        ``target_dim``/``target_value``/``sampling_seed`` may be scalars or
        per-sample arrays.  When ``logits`` is omitted the in-server
        classifier provides them.  Outputs are deterministic per request
        (same cloud/logits/target/seed -> same recon, however batched).
        """
        return self.counterfactual_async(
            clouds, target_dim, logits, target_value, sampling_seed
        ).result()

    def counterfactual_async(
        self,
        clouds: np.ndarray,
        target_dim: int | np.ndarray,
        logits: np.ndarray | None = None,
        target_value: float | np.ndarray = 1.0,
        sampling_seed: int | np.ndarray = 0,
    ) -> ServeFuture:
        """Dispatch a counterfactual request without blocking.

        The device compute and the device->host result copy are scheduled
        asynchronously; call :meth:`ServeFuture.result` when the array is
        needed.  Keeping two or more requests in flight overlaps host
        pad/transfer with device compute (the remote-tunnel round trip
        otherwise serialises with the compute, see BASELINE.md serving
        measurements).  Results are identical to :meth:`counterfactual`
        (same per-request determinism contract).  Oversize batches dispatch
        all bucket-size chunks up front, pipelining them on-device.
        """
        clouds = np.asarray(clouds, np.float32)
        n = clouds.shape[0]
        if logits is None:
            logits = self.classify(clouds)
        logits = np.asarray(logits, np.float32)
        tdim = np.broadcast_to(np.asarray(target_dim, np.int32), (n,)).copy()
        tval = np.broadcast_to(np.asarray(target_value, np.float32), (n,)).copy()
        seeds = np.broadcast_to(np.asarray(sampling_seed, np.int32), (n,)).copy()
        b = _next_bucket(n, self.buckets)
        parts: list[tuple[Array, int]] = []
        for i in range(0, n, b):
            m = min(b, n - i)
            recon = self._dispatch_chunk(
                clouds[i : i + b], logits[i : i + b], tdim[i : i + b],
                tval[i : i + b], seeds[i : i + b], b,
            )
            self._bump_stats(m, b)
            parts.append((recon, m))
        return ServeFuture(parts)

    def _dispatch_chunk(self, clouds, logits, tdim, tval, seeds, b: int) -> Array:
        """Pad to the bucket, dispatch the jitted decode, schedule the
        device->host copy; returns the (still in-flight) device array."""
        args = self._put(
            (
                _pad_batch(clouds, b),
                _pad_batch(logits, b),
                _pad_batch(tdim, b),
                _pad_batch(tval, b)[:, None],
                _pad_batch(seeds, b),
            )
        )
        if not self._prepacked:
            # first call: capture the fused-stack packed operands so every
            # later call (any bucket) skips the per-call weight repacking
            recon, mutated = self._gen_prepack(self._vq_vars, *args)
            packed = dict(mutated).get('packed', {})
            if packed:
                merged = dict(self._vq_vars)
                merged['packed'] = packed
                if self.mesh is not None:
                    from pccf.dist.mesh import replicate

                    merged = replicate(merged, self.mesh)
                self._vq_vars = merged
            self._prepacked = True
        else:
            recon = self._gen(self._vq_vars, *args)
        try:
            recon.copy_to_host_async()
        except Exception:
            pass  # backends without async host copies fetch lazily in result()
        return recon

    def generate(
        self,
        n: int,
        z1_bias: float = 0.0,
        probs: np.ndarray | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Sample ``n`` clouds from the generative prior (reference
        generate.py path).  Deterministic per (bucket, seed, chunk); pass
        distinct seeds for distinct draws."""
        b = _next_bucket(n, self.buckets)
        if n > b:
            return np.concatenate(
                [
                    self._generate_chunk(
                        min(b, n - i), z1_bias,
                        None if probs is None else probs[i : i + b], seed, i // b,
                    )
                    for i in range(0, n, b)
                ]
            )
        return self._generate_chunk(n, z1_bias, probs, seed, 0)

    def _generate_chunk(self, n, z1_bias, probs, seed, chunk) -> np.ndarray:
        b = _next_bucket(n, self.buckets)
        p = None if probs is None else self._put(_pad_batch(np.asarray(probs, np.float32), b))
        recon = self._sample(
            self._vq_vars, float(z1_bias), p, int(seed), int(chunk), batch_size=b
        )
        self._bump_stats(n, b)
        return np.asarray(recon[:n], np.float32)

    def _bump_stats(self, n: int, b: int) -> None:
        # read-modify-write on plain ints: must hold a lock or concurrent
        # requests silently undercount (the class advertises thread safety)
        with self._stats_lock:
            self.stats['served'] += n
            self.stats['batches'] += 1
            self.stats['padded'] += b - n

    # ------------------------------------------------------ microbatching
    def submit(
        self,
        cloud: np.ndarray,
        target_dim: int,
        logits: np.ndarray | None = None,
        target_value: float = 1.0,
        sampling_seed: int = 0,
    ) -> int:
        """Queue one cloud ``(N, 3)``; returns a ticket for :meth:`flush`."""
        cloud = np.asarray(cloud, np.float32)
        if cloud.ndim != 2 or cloud.shape[-1] != 3:
            raise ValueError(f'cloud must be (N, 3), got {cloud.shape}')
        if logits is None and self._cls_module is None:
            # reject here: a logits-less entry would make every later flush
            # raise and leave the queue permanently undrainable
            raise ValueError(
                'server built without a classifier: submit() requires logits'
            )
        with self._queue_lock:
            if self._queue and cloud.shape != self._queue[0][1].shape:
                raise ValueError(
                    f'cloud shape {cloud.shape} differs from queued '
                    f'{self._queue[0][1].shape}; flush() before switching shapes'
                )
            ticket = self._next_ticket
            self._next_ticket += 1
            self._queue.append(
                (ticket, cloud, logits, int(target_dim), float(target_value), int(sampling_seed))
            )
        return ticket

    def flush(self) -> dict[int, np.ndarray]:
        """Serve all queued requests as one batch; returns ticket -> recon."""
        with self._queue_lock:  # snapshot: submits landing mid-flush stay queued
            queue = list(self._queue)
        if not queue:
            return {}
        clouds = np.stack([q[1] for q in queue])
        tdim = np.asarray([q[3] for q in queue], np.int32)
        tval = np.asarray([q[4] for q in queue], np.float32)
        seeds = np.asarray([q[5] for q in queue], np.int32)
        have_logits = [q[2] for q in queue]
        missing = [i for i, lg in enumerate(have_logits) if lg is None]
        if missing:
            computed = self.classify(clouds[missing])  # only the gaps
            n_cls = computed.shape[1]
            logits = np.empty((len(queue), n_cls), np.float32)
            for i, lg in enumerate(have_logits):
                if lg is not None:
                    logits[i] = np.asarray(lg, np.float32)
            logits[missing] = computed
        else:
            logits = np.stack([np.asarray(lg, np.float32) for lg in have_logits])
        recon = self.counterfactual(clouds, tdim, logits, tval, seeds)
        # drain only the snapshot, only after success: a failed flush keeps
        # tickets redeemable, and requests submitted concurrently with the
        # device work stay queued for the next flush.  Drain by ticket
        # identity, not position — a concurrent flush may already have
        # removed this snapshot, and slicing by length would then strip
        # requests submitted in the meantime.
        with self._queue_lock:
            served = {q[0] for q in queue}
            self._queue = [q for q in self._queue if q[0] not in served]
        return {q[0]: recon[i] for i, q in enumerate(queue)}

    # ------------------------------------------------------------- warmup
    def warmup(
        self,
        n_points: int,
        n_classes: int,
        buckets: Sequence[int] | None = None,
        generate: bool = True,
    ) -> None:
        """Eagerly compile the given (default: all) buckets, covering every
        production entry point: counterfactual (prepack + steady-state),
        the classifier path when present, and (optionally) generate.

        Stats-neutral: warmup drives the real entry points, but its synthetic
        traffic must not inflate the public ``stats`` counters operators read
        for throughput/padding accounting."""
        with self._stats_lock:
            before = dict(self.stats)
        for b in buckets or self.buckets:
            cloud = np.zeros((b, n_points, 3), np.float32)
            logits = np.zeros((b, n_classes), np.float32)
            if not self._prepacked:
                # the first-ever call compiles the prepack variant; run the
                # bucket again below so the steady-state _gen also compiles
                self.counterfactual(cloud, 0, logits, 1.0)
            self.counterfactual(cloud, 0, logits, 1.0)
            if self._cls_module is not None:
                self.classify(cloud)
            if generate:
                self.generate(b)
                # probs is part of the jitted signature (array vs None):
                # compile that variant too or the first conditional
                # generate(probs=...) stalls on a fresh trace
                self.generate(b, probs=np.full((b, n_classes), 1.0 / n_classes, np.float32))
        with self._stats_lock:
            self.stats.update(before)
