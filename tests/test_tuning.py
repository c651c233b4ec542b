"""Tests for the native tuning engine."""

import math

import numpy as np
import pytest

from pccf.utils import tuning
from pccf.utils.tuning import MedianPruner, TrialPruned, TrialState


def make_study(tmp_path, **kw):
    return tuning.create_study('test', f'sqlite:///{tmp_path}/t.db', **kw)


class TestStudy:
    def test_optimize_and_best(self, tmp_path):
        study = make_study(tmp_path)

        def objective(trial):
            x = trial.suggest_float('x', -5, 5)
            trial.report((x - 1) ** 2, step=0)
            return (x - 1) ** 2

        study.optimize(objective, n_trials=40)
        assert abs(study.best_params['x'] - 1) < 2.0
        assert study.best_trial.value is not None

    def test_resume_from_storage(self, tmp_path):
        study = make_study(tmp_path)
        study.optimize(lambda t: t.suggest_float('x', 0, 1), n_trials=3)
        study2 = make_study(tmp_path)
        assert len(study2.get_trials()) == 3
        study2.optimize(lambda t: t.suggest_float('x', 0, 1), n_trials=2)
        assert len(study2.get_trials()) == 5

    def test_failed_trial_recorded(self, tmp_path):
        study = make_study(tmp_path)

        def bad(trial):
            raise RuntimeError('boom')

        # optuna semantics: caught exception types mark FAIL and continue
        study.optimize(bad, n_trials=2, catch=(RuntimeError,))
        assert all(t.state == TrialState.FAIL for t in study.get_trials())
        # an uncaught exception is recorded, then PROPAGATES (no silent
        # burn of the remaining trials)
        with pytest.raises(RuntimeError, match='boom'):
            study.optimize(bad, n_trials=5)
        trials = study.get_trials()
        assert len(trials) == 3  # only the one attempted trial was added
        assert trials[-1].state == TrialState.FAIL

    def test_concurrent_processes_get_distinct_trial_numbers(self, tmp_path):
        """Two studies on the same storage (the optuna parallelisation
        pattern) must never claim — and overwrite — the same trial row."""
        a = make_study(tmp_path)
        b = make_study(tmp_path)
        seen = []

        def obj_a(trial):
            seen.append(('a', trial.number))
            # interleave: b claims its trial while a's is still running
            b.optimize(obj_b, n_trials=1)
            return 0.0

        def obj_b(trial):
            seen.append(('b', trial.number))
            return 1.0

        a.optimize(obj_a, n_trials=2)
        numbers = [n for _, n in seen]
        assert len(numbers) == len(set(numbers)) == 4
        trials = a.get_trials()
        assert len(trials) == 4
        assert sorted(t.number for t in trials) == sorted(numbers)
        # every trial's result survived (no INSERT OR REPLACE clobbering)
        assert {t.value for t in trials} == {0.0, 1.0}

    def test_suggest_int_log(self, tmp_path):
        study = make_study(tmp_path)
        vals = []

        def objective(trial):
            vals.append(trial.suggest_int('d', 16, 512, log=True))
            return 0.0

        study.optimize(objective, n_trials=20)
        assert all(16 <= v <= 512 for v in vals)


class TestPruner:
    def test_median_pruner_prunes_bad_trials(self, tmp_path):
        pruner = MedianPruner(n_startup_trials=3, n_warmup_steps=0, interval_steps=1, n_min_trials=2)
        study = make_study(tmp_path, pruner=pruner)

        def objective(trial):
            good = trial.suggest_categorical('good', [True, False])
            for step in range(5):
                value = 0.1 if good else 10.0
                trial.report(value, step)
                if trial.should_prune():
                    raise TrialPruned()
            return value

        study.optimize(objective, n_trials=30)
        trials = study.get_trials()
        pruned = [t for t in trials if t.state == TrialState.PRUNED]
        completed = [t for t in trials if t.state == TrialState.COMPLETE]
        assert completed
        # once enough good trials completed, bad ones get pruned
        assert any(t.params.get('good') is False for t in pruned) or all(
            t.params.get('good') for t in completed[5:]
        )


class TestSuggestOverrides:
    def test_yaml_tree_to_overrides(self, tmp_path):
        tune_cfg = {
            'overrides': ['autoencoder.train.n_epochs=100'],
            'tune': {
                'params': {
                    'autoencoder.model.decoder.sample_dim': {
                        'suggest': 'suggest_categorical',
                        'settings': {'choices': [8, 16, 32]},
                    },
                    'autoencoder.model.decoder.map_dims': {
                        'suggest': 'suggest_list',
                        'settings': {
                            'min_length': 1,
                            'max_length': 3,
                            'suggest': 'suggest_int',
                            'settings': {'low': 8, 'high': 256, 'log': True},
                        },
                    },
                }
            },
        }
        study = make_study(tmp_path)
        trial = tuning.Trial(study, 0)
        overrides = tuning.suggest_overrides(tune_cfg, trial)
        assert overrides[0] == 'autoencoder.train.n_epochs=100'
        assert any(o.startswith('autoencoder.model.decoder.sample_dim=') for o in overrides)
        list_ov = [o for o in overrides if o.startswith('autoencoder.model.decoder.map_dims=')][0]
        values = list_ov.split('=', 1)[1]
        assert values.startswith('[') and values.endswith(']')
        # overrides must be consumable by the composer
        from pccf.config import get_config_all

        cfg = get_config_all(overrides)
        assert 1 <= len(cfg.autoencoder.model.decoder.map_dims) <= 3

    def test_imputation(self, tmp_path):
        study = make_study(tmp_path)

        def objective(trial):
            trial.suggest_float('x', 0, 1)
            v = float(trial.number)
            trial.report(v, 0)
            return v

        study.optimize(objective, n_trials=12)
        trial = tuning.Trial(study, 100)
        imputed = tuning.impute_pruned_trial(trial)
        assert imputed == pytest.approx(np.percentile(list(range(12)), 75))
        worst = tuning.impute_failed_trial(tuning.Trial(study, 101))
        assert worst == 11.0

    def test_imputation_needs_history(self, tmp_path):
        study = make_study(tmp_path)
        with pytest.raises(TrialPruned):
            tuning.impute_pruned_trial(tuning.Trial(study, 0))


class TestGPSampler:
    """GP sampler (reference runs optuna GPSampler, tune_autoencoder.py:60)."""

    @staticmethod
    def _branin_like(trial):
        # smooth 2-D objective with a single basin at (0.3, -0.7)
        x = trial.suggest_float('x', -1.0, 1.0)
        y = trial.suggest_float('y', -1.0, 1.0)
        return (x - 0.3) ** 2 + (y + 0.7) ** 2 + 0.3 * math.sin(3 * x) * math.sin(3 * y)

    def _best_after(self, tmp_path, sampler, n_trials, tag):
        study = tuning.create_study(
            f'gp_vs_rand_{tag}', f'sqlite:///{tmp_path}/{tag}.db', sampler=sampler
        )
        study.optimize(self._branin_like, n_trials=n_trials)
        return study.best_trial.value

    def test_gp_beats_random_on_2d(self, tmp_path):
        best_gp = self._best_after(
            tmp_path, tuning.GPSampler(seed=7, n_startup=8), 30, 'gp'
        )
        best_rand = self._best_after(tmp_path, tuning.RandomSampler(seed=7), 30, 'rand')
        assert best_gp < best_rand

    def test_gp_converges_near_optimum(self, tmp_path):
        best = self._best_after(
            tmp_path, tuning.GPSampler(seed=3, n_startup=8), 35, 'conv'
        )
        assert best < 0.08

    def test_gp_handles_categorical_and_log(self, tmp_path):
        study = tuning.create_study(
            'gp_mixed', f'sqlite:///{tmp_path}/mixed.db',
            sampler=tuning.GPSampler(seed=0, n_startup=5),
        )

        def objective(trial):
            lr = trial.suggest_float('lr', 1e-5, 1e-1, log=True)
            act = trial.suggest_categorical('act', ['relu', 'gelu'])
            width = trial.suggest_int('width', 8, 64)
            return (math.log10(lr) + 3) ** 2 + (0.0 if act == 'gelu' else 0.5) + abs(width - 32) / 32

        study.optimize(objective, n_trials=20)
        assert study.best_trial.value is not None
        assert set(study.best_params) == {'lr', 'act', 'width'}

    def test_make_sampler_selection(self):
        assert isinstance(tuning.make_sampler('gp'), tuning.GPSampler)
        assert isinstance(tuning.make_sampler('tpe'), tuning.TPESampler)
        assert isinstance(tuning.make_sampler('random'), tuning.RandomSampler)
        with pytest.raises(ValueError):
            tuning.make_sampler('cmaes')


class TestRunStudy:
    def test_run_study_drives_objective_and_persists(self, tmp_path):
        """run_study (the shared tuning entry-point driver) composes the
        tuning YAML, builds pruner/sampler/study, optimizes, and writes the
        sqlite DB + study plots."""
        tdir = tmp_path / 'tuningcfg'
        tdir.mkdir()
        (tdir / 'defaults.yaml').write_text(
            f"""
db_location: "{tmp_path / 'db'}"
db_name: unit_study
storage: "sqlite:///{tmp_path / 'db'}/unit_study.db"
renderer: png
overrides: []
tune:
  study_name: unit
  n_trials: 3
  sampler: random
  n_startup_trials: 1
  n_warmup_steps: 0
  interval_steps: 1
  n_min_trials: 1
  params: {{}}
"""
        )
        seen = []

        def set_objective(tune_cfg):
            assert tune_cfg['tune']['n_trials'] == 3

            def objective(trial):
                x = trial.suggest_float('x', 0.0, 1.0)
                trial.report(x, step=0)
                seen.append(x)
                return x

            return objective

        study = tuning.run_study(tdir, set_objective, argv=[])
        assert len(seen) == 3
        trials = study.get_trials()
        assert len(trials) == 3
        assert all(t.state == TrialState.COMPLETE for t in trials)
        assert (tmp_path / 'db' / 'unit_study.db').exists()


class TestPrunerNaN:
    def test_nan_trial_is_pruned(self, tmp_path):
        """A diverged trial reporting NaN must prune once the startup baseline
        exists (regression: 'NaN > median' is False, so NaN trials ran all
        their epochs); NaN intermediates in OTHER trials must not poison the
        median for everyone."""
        pruner = MedianPruner(n_startup_trials=2, n_warmup_steps=0, interval_steps=1, n_min_trials=2)
        study = make_study(tmp_path, pruner=pruner)
        seen_steps = {}

        def objective(trial):
            diverge = trial.number >= 2
            value = 1.0
            for step in range(6):
                value = float('nan') if diverge else 1.0 + 0.01 * step
                trial.report(value, step)
                seen_steps[trial.number] = step
                if trial.should_prune():
                    raise TrialPruned()
            return 0.0 if diverge else value

        study.optimize(objective, n_trials=4)
        trials = {t.number: t for t in study.get_trials()}
        assert trials[2].state == TrialState.PRUNED
        assert seen_steps[2] == 0  # pruned at the first NaN report
        assert trials[3].state == TrialState.PRUNED

    def test_baseline_nan_does_not_disable_pruning(self, tmp_path):
        pruner = MedianPruner(n_startup_trials=2, n_warmup_steps=0, interval_steps=1, n_min_trials=1)
        study = make_study(tmp_path, pruner=pruner)

        def objective(trial):
            # trials 0-1 complete WITH a NaN intermediate at step 0 but real
            # values later; trial 2 is clearly worse and must still prune
            bad = trial.number == 2
            for step in range(4):
                if step == 0 and not bad:
                    trial.report(float('nan'), step)
                else:
                    trial.report(100.0 if bad else 1.0, step)
                if trial.should_prune():
                    raise TrialPruned()
            return 1.0

        study.optimize(objective, n_trials=3)
        trials = {t.number: t for t in study.get_trials()}
        assert trials[2].state == TrialState.PRUNED


class TestSamplerSeeding:
    def test_default_sampler_seed_is_fresh_entropy(self):
        """make_sampler() without a seed must not replay one fixed rng stream:
        a resumed or parallel study with seed=0 would duplicate earlier
        startup trials exactly (regression: default seed=0)."""
        a = tuning.make_sampler('random')
        b = tuning.make_sampler('random')
        draws_a = [a.rng.random() for _ in range(4)]
        draws_b = [b.rng.random() for _ in range(4)]
        assert draws_a != draws_b
        # explicit seed stays reproducible
        c = tuning.make_sampler('random', seed=7)
        d = tuning.make_sampler('random', seed=7)
        assert [c.rng.random() for _ in range(4)] == [d.rng.random() for _ in range(4)]
