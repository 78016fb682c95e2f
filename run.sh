#!/bin/bash
# Canonical ProbEn recipes (mirrors reference run.sh)

#####################
# save predictions
#####################
# thermal only
python demo/FLIR/demo_FLIR_save_predictions.py --dataset_path /path/to/FLIR/val --fusion_method thermal_only --model_path trained_models/FLIR/thermal_only.pth
# early fusion
python demo/FLIR/demo_FLIR_save_predictions.py --dataset_path /path/to/FLIR/val --fusion_method early_fusion --model_path trained_models/FLIR/early_fusion.pth
# middle fusion
python demo/FLIR/demo_FLIR_save_predictions.py --dataset_path /path/to/FLIR/val --fusion_method middle_fusion --model_path trained_models/FLIR/middle_fusion.pth

#####################
# Late fusion
#####################
python demo/FLIR/demo_probEn.py --dataset_path /path/to/FLIR/val --prediction_path out/ \
        --score_fusion probEn --box_fusion v-avg

# score fusion choices: probEn, avg, max
# box fusion choices: v-avg (variance weighted), s-avg (score weighted), avg, argmax
