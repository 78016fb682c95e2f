#!/bin/bash -e
# Inference-accuracy regression (reference dev/run_inference_tests.sh):
# run each *inference_acc_test.yaml through the eval path and assert
# TEST.EXPECTED_RESULTS via evaluation.testing.verify_results.
for cfg in configs/quick_schedules/*inference_acc_test.yaml; do
    echo "========================================================================"
    echo "Running $cfg ..."
    echo "========================================================================"
    python dev/inference_acc_test.py --config-file "$cfg"
done
echo "inference acc tests OK"
