"""Drive train_autoencoder end-to-end with the fused ChamferEMD objective on
CPU (tunnel-down verify run: force the CPU platform both ways, keep
user.cpu=false so get_recon_loss builds the ChamferEMD composite)."""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('ROOT_EXP_DIR', '/tmp/verify_fused/exp')
os.environ.setdefault('DATASET_DIR', '/tmp/verify_fused/data')
import jax

jax.config.update('jax_platforms', 'cpu')

sys.argv = ['train_autoencoder.py', 'final=True'] + [
    'data/dataset=synthetic',
    'data.dataset.n_classes=2',
    'data.dataset.settings.n_train=16',
    'data.dataset.settings.n_test=8',
    'data.dataset.settings.base_points=128',
    'data.n_input_points=512',
    'data.n_target_points=512',
    'data.n_neighbors=8',
    'autoencoder.model.encoder.n_neighbors=8',
    'autoencoder.model.w_dim=32',
    'autoencoder.model.embedding_dim=4',
    'autoencoder.model.book_size=4',
    'autoencoder.model.decoder.map_dims=[8]',
    'autoencoder.model.decoder.conv_dims=[16,8]',
    'autoencoder.model.decoder.n_components=2',
    'autoencoder.model.decoder.sample_dim=4',
    'autoencoder.objective.recon_loss=ChamferEMD',
    'autoencoder.train.batch_size=4',
    'autoencoder.train.n_epochs=2',
    'autoencoder.train.early_stopping.active=false',
    'user.trackers.tensorboard=false',
    'user.checkpoint_every=0',
]

import runpy

runpy.run_path('train_autoencoder.py', run_name='__main__')
