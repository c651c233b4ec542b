"""Stage attribution of the VQ-VAE training step (VERDICT r3 #3).

Times each piece of the stage-1 hot loop separately — encoder fwd,
encoder fwd+bwd, decoder fwd+bwd, loss-only, full value_and_grad, optimizer
update, full trainer step — so the 165 ms/B8 step (BENCH_r03) can be
reconciled against the ~110 ms round-1 materialised-path claim
(BASELINE.md "Training-step extras").

Usage: python tools/profile_train.py [batch] [n]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys

import numpy as np


def _time_it(fn, *args, iters=6, warm=2):
    import time

    import jax

    for _ in range(warm):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main(batch=8, n=2048):
    import jax
    import jax.numpy as jnp
    import optax

    from pccf.config import get_config_all
    from pccf.data import get_datasets
    from pccf.data.protocols import Singleton
    from pccf.data.structures import Inputs
    from pccf.models import get_autoencoder
    from pccf.train import DataLoader, Model, Trainer, get_autoencoder_loss, get_learning_schema

    Singleton.reset_all()
    cfg = get_config_all(
        [
            'data/dataset=synthetic',
            'data.dataset.n_classes=2',
            f'data.n_input_points={n}',
            f'data.n_target_points={n}',
            f'autoencoder.train.batch_size={batch}',
            'autoencoder.objective.recon_loss=ChamferEMD',
        ]
    )
    ae = get_autoencoder(cfg)
    model = Model(ae, name='prof', seed=0)
    train_dataset, _ = get_datasets(cfg)
    loader = DataLoader(train_dataset, batch, n_workers=0)
    inputs, targets = next(iter(loader.epoch_iterator(1)))
    model.initialize(
        Inputs(cloud=inputs.cloud[:1]),
        np.zeros((1, cfg.data.dataset.n_classes), np.float32),
        method='full_init',
    )
    trainer = Trainer(model, loader, get_autoencoder_loss(cfg), get_learning_schema(cfg.autoencoder))
    trainer.prepare()
    rng = jax.random.key(7)
    report: dict[str, float] = {}

    # --- full trainer step (includes host metric fetch) ------------------
    report['full_step_ms'] = _time_it(
        lambda: trainer.run_step(inputs, targets, rng=rng, epoch=1.0), iters=8
    )

    # --- loss fwd / fwd+bwd ----------------------------------------------
    state = trainer.state
    params = state.params
    stats = state.batch_stats
    objective = trainer.objective
    cloud = jnp.asarray(inputs.cloud)
    b_inputs = Inputs(cloud=cloud)

    extra = {
        k: v for k, v in trainer.model.variables.items() if k not in ('params', 'batch_stats')
    }

    def loss_fn(p, train: bool):
        variables = {'params': p, 'batch_stats': stats, **extra}
        rngs = {'sampling': rng, 'dropout': rng}
        out, _mut = trainer.model.module.apply(
            variables, b_inputs, train=train, rngs=rngs, mutable=['batch_stats']
        )
        out = out.replace(model_epoch=jnp.asarray(1.0, jnp.float32))
        loss, _metrics = objective.loss_and_metrics(out, targets)
        return loss

    fwd_eval = jax.jit(lambda p: loss_fn(p, False))
    fwd_train = jax.jit(lambda p: loss_fn(p, True))
    grad_full = jax.jit(lambda p: jax.value_and_grad(lambda q: loss_fn(q, True))(p))
    report['fwd_eval_ms'] = _time_it(fwd_eval, params)
    report['fwd_train_ms'] = _time_it(fwd_train, params)
    report['fwd_bwd_ms'] = _time_it(grad_full, params)

    # --- encoder only ------------------------------------------------------
    enc_vars = {
        'params': params['encoder'],
        'batch_stats': stats.get('encoder', {}),
    }

    def enc_fwd(p, train):
        out, _ = ae.encoder.apply(
            {**enc_vars, 'params': p}, cloud, None, train, mutable=['batch_stats']
        )
        return jnp.sum(out * out)

    report['encoder_fwd_ms'] = _time_it(jax.jit(lambda p: enc_fwd(p, True)), params['encoder'])
    report['encoder_fwd_bwd_ms'] = _time_it(
        jax.jit(jax.value_and_grad(lambda p: enc_fwd(p, True))), params['encoder']
    )
    report['encoder_eval_ms'] = _time_it(jax.jit(lambda p: enc_fwd(p, False)), params['encoder'])

    # --- optimizer update on cached grads ----------------------------------
    _, grads = grad_full(params)
    tx = trainer._tx or optax.adamw(1e-3)
    opt_state = state.opt_state if trainer._tx is not None else tx.init(params)

    def opt_step(g, os_, p):
        updates, new_os = tx.update(g, os_, p)
        return optax.apply_updates(p, updates), new_os

    report['optimizer_ms'] = _time_it(jax.jit(opt_step), grads, opt_state, params)

    report = {k: round(v, 2) for k, v in report.items()}
    report['derived_decoder_loss_bwd_ms'] = round(
        report['fwd_bwd_ms'] - report['encoder_fwd_bwd_ms'], 2
    )
    print(json.dumps(report))


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
