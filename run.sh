#!/usr/bin/env bash
# Canonical pipeline (reference run.sh): 2 datasets x 4 stages.
set -e
python train_classifier.py "$@"
python train_autoencoder.py "$@"
python train_w_autoencoder.py "$@"
python evaluate_counterfactuals.py "$@"
python train_classifier.py data/dataset=modelnet_bottle_bowl_cup_vase "$@"
python train_autoencoder.py data/dataset=modelnet_bottle_bowl_cup_vase "$@"
python train_w_autoencoder.py data/dataset=modelnet_bottle_bowl_cup_vase "$@"
python evaluate_counterfactuals.py data/dataset=modelnet_bottle_bowl_cup_vase "$@"
