#!/usr/bin/env bash
# Canonical pipeline (reference run.sh:1-8): 2 datasets x 4 stages, every
# stage with final=True (train on train+val, evaluate on test), and the last
# counterfactual evaluation targeting class value 1.
set -e
python train_classifier.py final=True "$@"
python train_autoencoder.py final=True "$@"
python train_w_autoencoder.py final=True "$@"
python evaluate_counterfactuals.py final=True "$@"

python train_classifier.py final=True data/dataset=modelnet_bottle_bowl_cup_vase "$@"
python train_autoencoder.py final=True data/dataset=modelnet_bottle_bowl_cup_vase "$@"
python train_w_autoencoder.py final=True data/dataset=modelnet_bottle_bowl_cup_vase "$@"
python evaluate_counterfactuals.py final=True data/dataset=modelnet_bottle_bowl_cup_vase user.counterfactual_value=1 "$@"
