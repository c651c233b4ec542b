"""Serving-module tests on tiny shapes (CPU): bucketing, microbatching,
per-sample targets, bf16 cast, compile-cache behaviour."""

import numpy as np
import pytest

from pccf.config import get_config_all
from pccf.data.structures import Inputs
from pccf.models import get_autoencoder
from pccf.nn import get_classifier
from pccf.serve import CounterfactualServer, _next_bucket, _pad_batch
from pccf.train import Model

from tests.test_models import TINY_OVERRIDES

N_IN = 64


@pytest.fixture(scope='module')
def server():
    cfg = get_config_all(TINY_OVERRIDES)
    classifier = Model(get_classifier(cfg), name='cls', seed=0)
    classifier.initialize(Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)), train=False)
    vqvae = Model(get_autoencoder(cfg), name='vq', seed=0)
    vqvae.initialize(
        Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)),
        np.zeros((1, cfg.data.dataset.n_classes), np.float32),
        method='full_init',
    )
    return CounterfactualServer(vqvae, classifier, buckets=(2, 4))


def _clouds(n, seed=0):
    return np.random.default_rng(seed).standard_normal((n, N_IN, 3)).astype(np.float32) / 2


class TestBucketing:
    def test_next_bucket(self):
        assert _next_bucket(1, (2, 4)) == 2
        assert _next_bucket(3, (2, 4)) == 4
        assert _next_bucket(9, (2, 4)) == 4  # oversize -> chunking bucket

    def test_pad_batch(self):
        x = np.ones((3, 5))
        p = _pad_batch(x, 4)
        assert p.shape == (4, 5) and p[3].sum() == 0.0

    def test_bad_buckets_rejected(self, server):
        with pytest.raises(ValueError):
            CounterfactualServer(object(), buckets=(4, 2))


class TestServing:
    def test_counterfactual_pads_and_unpads(self, server):
        out = server.counterfactual(_clouds(3), target_dim=1)
        assert out.shape[0] == 3 and out.shape[2] == 3
        assert np.isfinite(out).all()

    def test_prepack_boundary_is_deterministic(self):
        """The first call runs the mutable=['packed'] prepack variant; later
        calls run the plain jit with the captured collection.  Both must
        return identical outputs for identical requests."""
        cfg = get_config_all(TINY_OVERRIDES)
        classifier = Model(get_classifier(cfg), name='cls_pp', seed=0)
        classifier.initialize(Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)), train=False)
        vqvae = Model(get_autoencoder(cfg), name='vq_pp', seed=0)
        vqvae.initialize(
            Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)),
            np.zeros((1, cfg.data.dataset.n_classes), np.float32),
            method='full_init',
        )
        srv = CounterfactualServer(vqvae, classifier, buckets=(2,))
        clouds = _clouds(2, seed=9)
        assert not srv._prepacked
        first = srv.counterfactual(clouds, target_dim=0)
        assert srv._prepacked
        second = srv.counterfactual(clouds, target_dim=0)
        np.testing.assert_array_equal(first, second)

    def test_oversize_batch_chunks_match_single_requests(self, server):
        clouds = _clouds(6, seed=1)
        logits = server.classify(clouds)
        whole = server.counterfactual(clouds, 0, logits)
        parts = np.concatenate(
            [server.counterfactual(clouds[i : i + 2], 0, logits[i : i + 2]) for i in (0, 2, 4)]
        )
        np.testing.assert_allclose(whole, parts, atol=1e-5)

    def test_async_matches_sync(self, server):
        """counterfactual_async().result() is the sync path exactly, and
        in-flight futures can be dispatched back-to-back (the pipelining
        contract) without cross-talk."""
        clouds = _clouds(4, seed=17)
        logits = server.classify(clouds)
        sync = server.counterfactual(clouds, 1, logits)
        f1 = server.counterfactual_async(clouds[:2], 1, logits[:2])
        f2 = server.counterfactual_async(clouds[2:], 1, logits[2:])
        got = np.concatenate([f1.result(), f2.result()])
        np.testing.assert_allclose(got, sync, atol=1e-5)

    def test_async_oversize_chunks_dispatch_up_front(self, server):
        """An oversize async request returns one future covering all chunks,
        equal to the sync chunked result."""
        clouds = _clouds(5, seed=18)
        logits = server.classify(clouds)
        fut = server.counterfactual_async(clouds, 0, logits)
        np.testing.assert_allclose(
            fut.result(), server.counterfactual(clouds, 0, logits), atol=1e-5
        )

    def test_per_sample_targets_match_per_row_calls(self, server):
        clouds = _clouds(2, seed=2)
        logits = server.classify(clouds)
        tdim = np.asarray([0, 1])
        tval = np.asarray([1.0, 0.5])
        mixed = server.counterfactual(clouds, tdim, logits, tval)
        for i in range(2):
            solo = server.counterfactual(
                clouds[i : i + 1], int(tdim[i]), logits[i : i + 1], float(tval[i])
            )
            np.testing.assert_allclose(mixed[i], solo[0], atol=1e-4)

    def test_padding_does_not_change_results(self, server):
        """Row 0 of a padded (1 -> bucket 2) batch equals row 0 of a full
        batch: padded rows must not leak into real outputs."""
        clouds = _clouds(2, seed=3)
        logits = server.classify(clouds)
        single = server.counterfactual(clouds[:1], 1, logits[:1])
        pair = server.counterfactual(clouds, 1, logits)
        np.testing.assert_allclose(single[0], pair[0], atol=1e-4)

    def test_classify_without_classifier_raises(self):
        cfg = get_config_all(TINY_OVERRIDES)
        vqvae = Model(get_autoencoder(cfg), name='vq2', seed=0)
        vqvae.initialize(
            Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)),
            np.zeros((1, cfg.data.dataset.n_classes), np.float32),
            method='full_init',
        )
        srv = CounterfactualServer(vqvae, buckets=(2,))
        with pytest.raises(ValueError):
            srv.classify(_clouds(1))
        # logits provided explicitly still serves
        out = srv.counterfactual(_clouds(1), 0, logits=np.zeros((1, 2), np.float32))
        assert out.shape[0] == 1


class TestMicrobatching:
    def test_submit_flush_round_trip(self, server):
        clouds = _clouds(3, seed=4)
        logits = server.classify(clouds)
        tickets = [server.submit(clouds[i], target_dim=i % 2, logits=logits[i]) for i in range(3)]
        results = server.flush()
        assert sorted(results) == sorted(tickets)
        direct = server.counterfactual(clouds, np.asarray([0, 1, 0]), logits)
        for i, t in enumerate(tickets):
            np.testing.assert_allclose(results[t], direct[i], atol=1e-4)
        assert server.flush() == {}  # queue drained

    def test_submit_validates_shapes(self, server):
        with pytest.raises(ValueError):
            server.submit(np.zeros((N_IN, 2), np.float32), 0)  # not (N, 3)
        t = server.submit(np.zeros((N_IN, 3), np.float32), 0)
        with pytest.raises(ValueError):
            server.submit(np.zeros((N_IN * 2, 3), np.float32), 0)  # mixed N
        assert t in server.flush()  # valid request still redeemable

    def test_flush_fills_missing_logits_from_classifier(self, server):
        clouds = _clouds(2, seed=5)
        t0 = server.submit(clouds[0], target_dim=0)  # no logits
        t1 = server.submit(clouds[1], target_dim=1, logits=server.classify(clouds[1:2])[0])
        results = server.flush()
        assert set(results) == {t0, t1}
        assert all(np.isfinite(v).all() for v in results.values())

    def test_flush_keeps_requests_submitted_while_serving(self, server, monkeypatch):
        """A submit() landing while flush()'s device work is in flight must
        stay queued for the next flush, not be silently discarded."""
        clouds = _clouds(3, seed=6)
        logits = server.classify(clouds)
        t0 = server.submit(clouds[0], 0, logits=logits[0])
        real_cf = server.counterfactual
        late: list[int] = []

        def cf_and_submit(*args, **kwargs):
            out = real_cf(*args, **kwargs)
            if not late:  # mid-flush arrival, after the queue snapshot
                late.append(server.submit(clouds[1], 1, logits=logits[1]))
            return out

        monkeypatch.setattr(server, 'counterfactual', cf_and_submit)
        first = server.flush()
        assert set(first) == {t0}
        second = server.flush()
        assert set(second) == set(late)  # late ticket served, not dropped

    def test_overlapping_flushes_do_not_drop_new_submits(self, server, monkeypatch):
        """Two flushes sharing a snapshot must not double-drain: the outer
        flush's drain runs after an inner flush already removed the snapshot,
        and a request submitted in between must survive (regression: draining
        by slice length stripped it; the drain is now by ticket identity)."""
        clouds = _clouds(2, seed=8)
        logits = server.classify(clouds)
        t0 = server.submit(clouds[0], 0, logits=logits[0])
        real_cf = server.counterfactual
        state: dict = {}

        def cf(*args, **kwargs):
            out = real_cf(*args, **kwargs)
            if not state.get('fired'):
                state['fired'] = True
                # inner flush drains the shared snapshot first, then a new
                # request lands — all before the outer flush's own drain
                state['inner'] = server.flush()
                state['late'] = server.submit(clouds[1], 1, logits=logits[1])
            return out

        monkeypatch.setattr(server, 'counterfactual', cf)
        outer = server.flush()
        assert set(state['inner']) == {t0}
        assert set(outer) == {t0}
        final = server.flush()
        assert set(final) == {state['late']}, 'late submit was dropped by double-drain'


class TestGenerate:
    def test_generate_shapes_and_determinism(self, server):
        a = server.generate(3, seed=1)
        b = server.generate(3, seed=1)
        assert a.shape[0] == 3 and a.shape[2] == 3 and np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)
        c = server.generate(3, seed=2)
        assert np.abs(a - c).max() > 1e-4  # distinct draws per seed

    def test_generate_with_probs(self, server):
        probs = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
        out = server.generate(2, probs=probs)
        assert out.shape[0] == 2 and np.isfinite(out).all()

    def test_generate_oversize_chunks(self, server):
        out = server.generate(9)  # buckets (2, 4): chunks of 4
        assert out.shape[0] == 9 and np.isfinite(out).all()

    def test_generate_chunk_seeds_do_not_collide_with_user_seeds(self, server):
        """Chunked draws fold (seed, chunk) at two levels: a later chunk of
        one call must not reproduce another call's first chunk (regression:
        the seed+offset scheme made generate(8, seed=0)[4:] == generate(...,
        seed=4))."""
        whole = server.generate(8, seed=0)  # two chunks of bucket 4
        first = server.generate(4, seed=0)
        np.testing.assert_array_equal(whole[:4], first)  # chunk determinism
        for s in range(1, 6):
            other = server.generate(4, seed=s)
            assert np.abs(whole[4:] - other).max() > 1e-5


class TestMeshServing:
    def test_dp_mesh_matches_single_device(self, server):
        """Data-parallel serving over the virtual 8-device mesh returns the
        same recons as the single-device server (dp shards rows only)."""
        from pccf.dist.mesh import get_mesh

        cfg = get_config_all(TINY_OVERRIDES)
        classifier = Model(get_classifier(cfg), name='cls_m', seed=0)
        classifier.initialize(Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)), train=False)
        vqvae = Model(get_autoencoder(cfg), name='vq_m', seed=0)
        vqvae.initialize(
            Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)),
            np.zeros((1, cfg.data.dataset.n_classes), np.float32),
            method='full_init',
        )
        mesh = get_mesh(4)
        meshed = CounterfactualServer(vqvae, classifier, buckets=(4, 8), mesh=mesh)
        clouds = _clouds(3, seed=7)
        logits = meshed.classify(clouds)
        got = meshed.counterfactual(clouds, 1, logits)
        want = server.counterfactual(clouds, 1, server.classify(clouds))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_indivisible_buckets_rejected(self):
        from pccf.dist.mesh import get_mesh

        with pytest.raises(ValueError):
            CounterfactualServer(object(), buckets=(2, 6), mesh=get_mesh(4))


class TestBF16:
    def test_bf16_cast_serves_close_to_f32(self):
        import jax.numpy as jnp

        cfg = get_config_all(TINY_OVERRIDES)
        classifier = Model(get_classifier(cfg), name='cls3', seed=0)
        classifier.initialize(Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)), train=False)
        vqvae = Model(get_autoencoder(cfg), name='vq3', seed=0)
        vqvae.initialize(
            Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)),
            np.zeros((1, cfg.data.dataset.n_classes), np.float32),
            method='full_init',
        )
        f32 = CounterfactualServer(vqvae, classifier, buckets=(2,))
        b16 = CounterfactualServer(vqvae, classifier, buckets=(2,), cast_bf16=True)
        import jax

        assert any(
            p.dtype == jnp.bfloat16 for p in jax.tree.leaves(b16._vq_vars)
        )
        clouds = _clouds(2, seed=6)
        logits = f32.classify(clouds)
        a = f32.counterfactual(clouds, 0, logits)
        b = b16.counterfactual(clouds, 0, logits)
        assert np.isfinite(b).all()
        # bf16 is a lossy speed mode; outputs stay in the same regime
        assert np.abs(a - b).max() < 0.3


class TestWarmup:
    def test_warmup_covers_all_entry_points(self):
        """warmup() must leave counterfactual (prepacked), the classifier
        path, and generate all compiled and serving."""
        cfg = get_config_all(TINY_OVERRIDES)
        classifier = Model(get_classifier(cfg), name='cls_w', seed=0)
        classifier.initialize(Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)), train=False)
        vqvae = Model(get_autoencoder(cfg), name='vq_w', seed=0)
        vqvae.initialize(
            Inputs(cloud=np.zeros((1, N_IN, 3), np.float32)),
            np.zeros((1, cfg.data.dataset.n_classes), np.float32),
            method='full_init',
        )
        srv = CounterfactualServer(vqvae, classifier, buckets=(2,))
        srv.warmup(N_IN, cfg.data.dataset.n_classes)
        assert srv._prepacked
        # logits-less request rides the warmed classifier path
        out = srv.counterfactual(_clouds(1, seed=8), 0)
        assert out.shape == (1, out.shape[1], 3) and np.isfinite(out).all()
        g = srv.generate(2)
        assert g.shape[0] == 2 and np.isfinite(g).all()
        # warmup after traffic does not reset prepack state
        srv.warmup(N_IN, cfg.data.dataset.n_classes, generate=False)
        assert srv._prepacked


class TestWarmupStats:
    def test_warmup_is_stats_neutral(self, server):
        """warmup drives the real entry points; its synthetic traffic must not
        inflate the public stats counters operators read for throughput and
        padding accounting (regression: warmup left ~2+2*sum(buckets) in
        'served' before the first production request)."""
        srv = server
        base = dict(srv.stats)
        srv.warmup(N_IN, 2, generate=False)
        assert srv.stats == base
        srv.counterfactual(_clouds(1, seed=21), 0, np.zeros((1, 2), np.float32), 1.0)
        assert srv.stats['served'] == base['served'] + 1
        assert srv.stats['batches'] == base['batches'] + 1
