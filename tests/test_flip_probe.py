"""Counterfactual flip-rate regression test (default suite, ~30 s CPU).

Trains the conditional W-AE at micro scale with the exact stage-2 objective
and asserts ``generate_counterfactual`` steers decodes to the target class
well above chance (reference capability: src/module/w_autoencoders.py:247-262
+ evaluate_counterfactuals.py Counterfeit_to_j suites).  This guards the one
behavior the project exists for on every run (VERDICT r4 #9) — round 4's
quality run silently recorded chance-rate flips because nothing in the
default suite exercised the conditioning channel end-to-end.

Regime: the whole probe trains as one lax.scan (flip_probe.run); the
flip-capable micro regime (beta_z1=2.0, anneal completed at 40% of the run,
200 epochs, 32/class) measured flip rates 1.0/1.0/0.75/1.0 over seeds 0-3
on CPU.  Seed 0 (measured 1.0) with a 0.6 threshold leaves a wide margin
over both run-to-run numerics and the broken-channel failure mode (~0.25
chance over 4 classes).
"""


def test_counterfactuals_flip_above_chance():
    from tools.flip_probe import run

    result = run(
        epochs=200,
        beta_z1=2.0,
        beta_z2=4.0,
        lr=5e-3,
        n_per_class=32,
        anneal_frac=0.4,
        seed=0,
        quiet=True,
    )
    assert result['flip_rate'] >= 0.6, result
    # reconstruction must stay meaningful while flips happen (a decoder that
    # ignores w entirely could "flip" by emitting the prior mean)
    assert result['final_mse'] < 60.0, result
