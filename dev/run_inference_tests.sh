#!/bin/bash -e
set -e  # the shebang's -e is ignored when invoked as 'bash script.sh'
# Inference-accuracy regression (reference dev/run_inference_tests.sh):
# 1) plumbing gate: loader -> evaluator -> verify_results with a perfect
#    synthetic predictor (exact-mAP sanity of the eval pipeline itself);
# 2) MODEL-IN-THE-LOOP gates: train a tiny R50 from scratch to overfit the
#    synthetic set and assert its REAL eval AP (training gate), then reload
#    the saved checkpoint in a fresh process and assert the same AP
#    (inference gate) — the reference's *_acc_test.yaml semantics
#    (evaluation/testing.py:27 verify_results).
for cfg in configs/quick_schedules/*inference_acc_test.yaml; do
    echo "========================================================================"
    echo "Running $cfg (eval-pipeline plumbing gate) ..."
    echo "========================================================================"
    python dev/inference_acc_test.py --config-file "$cfg"
done

ACC_OUT=$(mktemp -d)
trap 'rm -rf "$ACC_OUT"' EXIT
echo "========================================================================"
echo "Running rcnn_training_acc_test.yaml (model-in-the-loop training gate) ..."
echo "========================================================================"
python dev/training_acc_test.py \
    --config-file configs/quick_schedules/rcnn_training_acc_test.yaml \
    OUTPUT_DIR "$ACC_OUT"
echo "========================================================================"
echo "Running model_inference_acc_test (checkpoint-reload inference gate) ..."
echo "========================================================================"
python dev/model_inference_acc_test.py \
    --config-file configs/quick_schedules/rcnn_training_acc_test.yaml \
    OUTPUT_DIR "$ACC_OUT"
echo "inference acc tests OK"
