#!/bin/bash -e
set -e  # the shebang's -e is ignored when invoked as 'bash script.sh'
# Train every quick_schedules/*instant_test.yaml for a few iterations on a
# synthetic dataset (reference dev/run_instant_tests.sh).
BIN="python dev/instant_train.py"
OUTPUT="instant_test_output"
mkdir -p "$OUTPUT"

for cfg in configs/quick_schedules/*instant_test.yaml; do
    echo "========================================================================"
    echo "Running $cfg ..."
    echo "========================================================================"
    $BIN --config-file "$cfg" OUTPUT_DIR "$OUTPUT"
    rm -rf "$OUTPUT"
done
echo "instant tests OK"
