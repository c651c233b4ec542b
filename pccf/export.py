"""Deployment artifacts: serialized StableHLO endpoints via ``jax.export``.

Beyond-parity component (the reference serves from Python checkpoints only —
``evaluate_counterfactuals.py`` / ``visualize_counterfactuals.py`` rebuild
the module tree from configs every run): a trained
:class:`pccf.serve.CounterfactualServer` is exported as **self-contained
StableHLO modules** — weights baked in as constants — that run with only
``jax`` on the serving host: no model code, no config tree, no checkpoint
files, no pccf install.

Design:

- **one artifact per (endpoint, platform)** plus a ``manifest.json``.
  Platforms are independent exports because the kernel dispatch
  (``pccf.kernels.api``) picks Pallas-vs-jnp at *trace* time: ``tpu``
  artifacts carry the fused Mosaic kernels, ``cpu`` artifacts the jnp
  paths.  Cross-platform export works (a CPU host can emit TPU artifacts —
  Mosaic lowering is ahead-of-time).
- **symbolic batch dimension** where the traced code allows it: one
  artifact serves every batch size, and the loader's bucketing only bounds
  the *consumer-side* compile count.  Endpoints whose tracing rejects
  shape-polymorphism (e.g. PRNG draws with symbolic shapes on some jax
  versions) fall back to per-bucket concrete exports automatically.
- **no prepack step**: the fused transformer-stack repacking
  (``w_networks._packed_stack``) runs on baked constants inside the
  exported module, so XLA constant-folds it once per consumer compile —
  the serve-time ``mutable=['packed']`` dance is unnecessary here.
- **determinism contract matches the server**: the exported
  ``counterfactual`` folds the same ``base_key(seed)`` per request seed as
  :meth:`CounterfactualServer.counterfactual`, so artifact outputs are
  pad/chunk/batch invariant and reproduce the live server bit-for-bit on
  the same platform.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from pccf.data.structures import Inputs
from pccf.kernels import api as kapi

logger = logging.getLogger(__name__)

Array = jax.Array

_MANIFEST = 'manifest.json'


def _current_platform() -> str:
    backend = jax.default_backend()
    return 'tpu' if backend in ('tpu', 'axon') else backend


def _poly_batch():
    scope = jax_export.SymbolicScope()
    (b,) = jax_export.symbolic_shape('b', scope=scope)
    return b


def _spec(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _export_endpoint(fn, arg_specs_of, buckets, platform, out_dir: Path, name: str):
    """Export ``fn`` for ``platform``; symbolic batch first, per-bucket fallback.

    ``arg_specs_of(b)`` returns the positional ShapeDtypeStructs for batch
    dimension ``b`` (symbolic or concrete int).
    """
    jitted = jax.jit(fn)
    try:
        exp = jax_export.export(jitted, platforms=[platform])(*arg_specs_of(_poly_batch()))
        fname = f'{name}.{platform}.hlo'
        (out_dir / fname).write_bytes(exp.serialize())
        return {'poly': fname}
    except Exception as e:
        # expected for endpoints whose trace genuinely needs a concrete batch
        # (e.g. data-dependent reshapes) — but say so loudly and record why,
        # so a regression of the polymorphic path (which costs consumers one
        # compile per bucket instead of one total) never passes silently
        logger.warning(
            'symbolic-batch export of %s for %s failed (%s: %.200s); '
            'falling back to per-bucket artifacts',
            name,
            platform,
            type(e).__name__,
            e,
        )
        files = {}
        for b in buckets:
            exp = jax_export.export(jitted, platforms=[platform])(*arg_specs_of(int(b)))
            fname = f'{name}.{platform}.b{b}.hlo'
            (out_dir / fname).write_bytes(exp.serialize())
            files[str(int(b))] = fname
        return {'buckets': files, 'poly_error': f'{type(e).__name__}: {str(e)[:200]}'}


def export_server(
    server,
    path: str | Path,
    n_points: int,
    n_classes: int,
    *,
    platforms: Sequence[str] | None = None,
    include_generate: bool = True,
) -> dict[str, Any]:
    """Export a built :class:`~pccf.serve.CounterfactualServer` to ``path``.

    Writes one ``.hlo`` file per (endpoint, platform) and a
    ``manifest.json``; returns the manifest dict.  ``n_points``/``n_classes``
    fix the non-batch input dims (the reference pipeline's
    ``data.n_input_points`` / dataset class count).

    Endpoints: ``counterfactual`` (cloud, logits, target_dim, target_value,
    seeds), ``classify`` (when the server holds a classifier), and
    ``generate`` (probs, z1_bias, seed, chunk) unless disabled.
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    platforms = tuple(platforms) if platforms else (_current_platform(),)

    module = server._vq_module
    vq_vars = server._vq_vars
    base_key = jax.random.key(server.seed)
    n_out = int(module.n_inference_output_points)
    sample_dim = int(module.decoder.sample_dim)
    conditional = bool(module.w_autoencoder.conditional)

    def cf_fn(cloud, logits, target_dim, target_value, seeds):
        init_s = jax.vmap(
            lambda s: jax.random.normal(jax.random.fold_in(base_key, s), (n_out, sample_dim))
        )(seeds)
        out = module.apply(
            vq_vars,
            Inputs(cloud=cloud, initial_sampling=init_s),
            logits,
            target_dim,
            target_value,
            method='generate_counterfactual',
        )
        return out.recon

    def cf_specs(b):
        return (
            _spec((b, n_points, 3), jnp.float32),
            _spec((b, n_classes), jnp.float32),
            _spec((b,), jnp.int32),
            _spec((b, 1), jnp.float32),
            _spec((b,), jnp.int32),
        )

    def gen_fn(probs, z1_bias, seed, chunk):
        rngs = {'sampling': jax.random.fold_in(jax.random.fold_in(base_key, seed), chunk)}
        out = module.apply(
            vq_vars, probs.shape[0], None, z1_bias, probs, method='generate', rngs=rngs
        )
        return out.recon

    def gen_specs(b):
        return (
            _spec((b, n_classes), jnp.float32),
            _spec((), jnp.float32),
            _spec((), jnp.int32),
            _spec((), jnp.int32),
        )

    endpoints: dict[str, Any] = {}
    for platform in platforms:
        # pin the kernel dispatch to the TARGET platform during tracing
        # (api._use_pallas consults the backend override, not the lowering
        # target); force_backend is thread-scoped, so concurrent traces in
        # other threads (e.g. a live server compiling a bucket) are unaffected
        with kapi.force_backend('pallas' if platform == 'tpu' else 'jnp'):
            endpoints.setdefault('counterfactual', {})[platform] = _export_endpoint(
                cf_fn, cf_specs, server.buckets, platform, path, 'counterfactual'
            )
            if server._cls_module is not None:
                cls_module, cls_vars = server._cls_module, server._cls_vars

                def cls_fn(cloud):
                    return cls_module.apply(cls_vars, Inputs(cloud=cloud), train=False)

                endpoints.setdefault('classify', {})[platform] = _export_endpoint(
                    cls_fn,
                    lambda b: (_spec((b, n_points, 3), jnp.float32),),
                    server.buckets,
                    platform,
                    path,
                    'classify',
                )
            if include_generate:
                endpoints.setdefault('generate', {})[platform] = _export_endpoint(
                    gen_fn, gen_specs, server.buckets, platform, path, 'generate'
                )

    import pccf

    manifest = {
        'pccf_version': getattr(pccf, '__version__', '0'),
        'n_points': int(n_points),
        'n_out': n_out,
        'n_classes': int(n_classes),
        'buckets': [int(b) for b in server.buckets],
        'seed': int(server.seed),
        'conditional': conditional,
        'platforms': list(platforms),
        'endpoints': endpoints,
    }
    (path / _MANIFEST).write_text(json.dumps(manifest, indent=1))
    return manifest


class ServingArtifact:
    """Load and run exported endpoints — needs only jax + the artifact dir.

    Mirrors the :class:`~pccf.serve.CounterfactualServer` call surface
    (numpy in/out, bucket padding, oversize chunking, per-sample targets)
    without importing any model code.
    """

    def __init__(self, path: str | Path, platform: str | None = None) -> None:
        self.path = Path(path)
        self.manifest = json.loads((self.path / _MANIFEST).read_text())
        self.platform = platform or _current_platform()
        if self.platform not in self.manifest['platforms']:
            raise ValueError(
                f'artifact was exported for {self.manifest["platforms"]}, '
                f'current platform is {self.platform!r}'
            )
        self.buckets = tuple(self.manifest['buckets'])
        self._fns: dict[tuple[str, int | None], Any] = {}

    # ------------------------------------------------------------ internal
    def _entry(self, name: str) -> dict:
        try:
            return self.manifest['endpoints'][name][self.platform]
        except KeyError:
            raise ValueError(f'endpoint {name!r} not in artifact for {self.platform!r}') from None

    def _fn(self, name: str, b: int):
        entry = self._entry(name)
        key = (name, None if 'poly' in entry else b)
        if key not in self._fns:
            fname = entry['poly'] if 'poly' in entry else entry['buckets'][str(b)]
            self._fns[key] = jax_export.deserialize((self.path / fname).read_bytes())
        return self._fns[key]

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return int(b)
        return int(self.buckets[-1])

    @staticmethod
    def _pad(x: np.ndarray, b: int) -> np.ndarray:
        if x.shape[0] == b:
            return x
        return np.pad(x, [(0, b - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    # ------------------------------------------------------------- public
    def classify(self, clouds: np.ndarray) -> np.ndarray:
        clouds = np.asarray(clouds, np.float32)
        n = clouds.shape[0]
        b = self._bucket(n)
        if n > b:
            return np.concatenate(
                [self.classify(clouds[i : i + b]) for i in range(0, n, b)]
            )
        out = self._fn('classify', b).call(self._pad(clouds, b))
        return np.asarray(out[:n], np.float32)

    def counterfactual(
        self,
        clouds: np.ndarray,
        target_dim: int | np.ndarray,
        logits: np.ndarray | None = None,
        target_value: float | np.ndarray = 1.0,
        sampling_seed: int | np.ndarray = 0,
    ) -> np.ndarray:
        clouds = np.asarray(clouds, np.float32)
        n = clouds.shape[0]
        if logits is None:
            logits = self.classify(clouds)
        logits = np.asarray(logits, np.float32)
        tdim = np.broadcast_to(np.asarray(target_dim, np.int32), (n,)).copy()
        tval = np.broadcast_to(np.asarray(target_value, np.float32), (n,)).copy()
        seeds = np.broadcast_to(np.asarray(sampling_seed, np.int32), (n,)).copy()
        b = self._bucket(n)
        if n > b:
            return np.concatenate(
                [
                    self.counterfactual(
                        clouds[i : i + b], tdim[i : i + b], logits[i : i + b],
                        tval[i : i + b], seeds[i : i + b],
                    )
                    for i in range(0, n, b)
                ]
            )
        out = self._fn('counterfactual', b).call(
            self._pad(clouds, b),
            self._pad(logits, b),
            self._pad(tdim, b),
            self._pad(tval, b)[:, None],
            self._pad(seeds, b),
        )
        return np.asarray(out[:n], np.float32)

    def generate(
        self,
        n: int,
        z1_bias: float = 0.0,
        probs: np.ndarray | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Sample from the generative prior.  When ``probs`` is omitted the
        class-probability draw happens HOST-side (Dirichlet(1) for a
        conditional model, uniform otherwise) — distributionally identical
        to the live server's in-graph draw, but not bit-identical to it."""
        b = self._bucket(n)
        if n > b:
            return np.concatenate(
                [
                    self._gen_chunk(
                        min(b, n - i),
                        z1_bias,
                        None if probs is None else probs[i : i + b],
                        seed,
                        i // b,
                    )
                    for i in range(0, n, b)
                ]
            )
        return self._gen_chunk(n, z1_bias, probs, seed, 0)

    def _gen_chunk(self, n, z1_bias, probs, seed, chunk) -> np.ndarray:
        b = self._bucket(n)
        n_classes = int(self.manifest['n_classes'])
        if probs is None:
            if self.manifest['conditional']:
                rng = np.random.default_rng((int(seed), int(chunk)))
                probs = rng.dirichlet(np.ones(n_classes), size=b).astype(np.float32)
            else:
                probs = np.full((b, n_classes), 1.0 / n_classes, np.float32)
        out = self._fn('generate', b).call(
            self._pad(np.asarray(probs, np.float32), b),
            np.float32(z1_bias),
            np.int32(seed),
            np.int32(chunk),
        )
        return np.asarray(out[:n], np.float32)


def load_artifact(path: str | Path, platform: str | None = None) -> ServingArtifact:
    """Open an exported artifact directory for serving."""
    return ServingArtifact(path, platform)
