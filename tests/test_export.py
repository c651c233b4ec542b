"""Deployment-artifact tests: export a tiny server to StableHLO, reload it
with no model code in the loop, and check parity with the live server.

Beyond-parity subsystem (the reference serves from Python checkpoints only);
see pccf/export.py.
"""

import json

import numpy as np
import pytest

from pccf.config import get_config_all
from pccf.data.structures import Inputs
from pccf.export import export_server, load_artifact
from pccf.models import get_autoencoder
from pccf.nn import get_classifier
from pccf.serve import CounterfactualServer
from pccf.train import Model

from tests.test_models import TINY_OVERRIDES

N_IN = 64


@pytest.fixture(scope='module')
def server():
    cfg = get_config_all(TINY_OVERRIDES)
    classifier = Model(get_classifier(cfg), name='cls_exp', seed=0)
    classifier.initialize(Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)), train=False)
    vqvae = Model(get_autoencoder(cfg), name='vq_exp', seed=0)
    vqvae.initialize(
        Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)),
        np.zeros((1, cfg.data.dataset.n_classes), np.float32),
        method='full_init',
    )
    return CounterfactualServer(vqvae, classifier, buckets=(2, 4)), cfg


@pytest.fixture(scope='module')
def artifact(server, tmp_path_factory):
    srv, cfg = server
    path = tmp_path_factory.mktemp('artifact')
    manifest = export_server(srv, path, N_IN, cfg.data.dataset.n_classes)
    return load_artifact(path), manifest, path


def _clouds(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, N_IN, 3)).astype(np.float32) / 2


class TestExport:
    def test_manifest_written(self, artifact):
        art, manifest, path = artifact
        on_disk = json.loads((path / 'manifest.json').read_text())
        assert on_disk == manifest
        assert set(manifest['endpoints']) == {'counterfactual', 'classify', 'generate'}
        assert manifest['n_points'] == N_IN
        assert manifest['buckets'] == [2, 4]
        # every referenced .hlo file exists and is non-trivial
        for ep in manifest['endpoints'].values():
            for platform_entry in ep.values():
                files = (
                    [platform_entry['poly']]
                    if 'poly' in platform_entry
                    else list(platform_entry['buckets'].values())
                )
                for f in files:
                    assert (path / f).stat().st_size > 1000, f

    def test_classify_matches_live_server(self, server, artifact):
        srv, _ = server
        art, _, _ = artifact
        clouds = _clouds(3, seed=1)
        np.testing.assert_allclose(
            art.classify(clouds), srv.classify(clouds), atol=1e-5
        )

    def test_counterfactual_matches_live_server(self, server, artifact):
        """Same platform + same seed structure -> the artifact reproduces the
        live server (weights are baked constants, determinism contract
        shared via CounterfactualServer.seed)."""
        srv, _ = server
        art, _, _ = artifact
        clouds = _clouds(2, seed=2)
        logits = srv.classify(clouds)
        live = srv.counterfactual(clouds, 1, logits, 0.75, sampling_seed=5)
        exported = art.counterfactual(clouds, 1, logits, 0.75, sampling_seed=5)
        np.testing.assert_allclose(exported, live, atol=1e-5)

    def test_counterfactual_without_logits_uses_exported_classifier(self, server, artifact):
        srv, _ = server
        art, _, _ = artifact
        clouds = _clouds(2, seed=3)
        np.testing.assert_allclose(
            art.counterfactual(clouds, 0),
            srv.counterfactual(clouds, 0),
            atol=1e-5,
        )

    def test_batch_sizes_beyond_buckets_chunk(self, server, artifact):
        srv, _ = server
        art, _, _ = artifact
        clouds = _clouds(7, seed=4)  # > max bucket 4 -> chunked
        logits = srv.classify(clouds)
        np.testing.assert_allclose(
            art.counterfactual(clouds, 0, logits),
            srv.counterfactual(clouds, 0, logits),
            atol=1e-5,
        )

    def test_generate_shapes_and_determinism(self, server, artifact):
        art, manifest, _ = artifact
        out = art.generate(3, seed=7)
        assert out.shape == (3, manifest['n_out'], 3)
        assert np.isfinite(out).all()
        np.testing.assert_array_equal(out, art.generate(3, seed=7))
        # explicit probs path is bit-deterministic vs the live server too
        srv, cfg = server
        n_classes = cfg.data.dataset.n_classes
        probs = np.full((2, n_classes), 1.0 / n_classes, np.float32)
        np.testing.assert_allclose(
            art.generate(2, probs=probs, seed=3),
            srv.generate(2, probs=probs, seed=3),
            atol=1e-5,
        )

    def test_wrong_platform_rejected(self, artifact):
        _, _, path = artifact
        with pytest.raises(ValueError, match='exported for'):
            load_artifact(path, platform='rocm')

    def test_loader_needs_no_model_code(self, artifact):
        """The artifact dir + manifest alone drive inference: a fresh loader
        instance never touches configs, checkpoints, or pccf model modules
        (constructor only reads manifest.json; calls only deserialize .hlo)."""
        _, _, path = artifact
        art = load_artifact(path)
        out = art.classify(_clouds(1, seed=5))
        assert out.ndim == 2 and out.shape[0] == 1
