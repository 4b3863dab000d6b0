#!/bin/bash
# The reference's examples/vw-compatibility flow (reference:
# examples/vw-compatibility/run.sh): the LR-only --vwcompat config over the
# reference's dataset. The original diffs against a vw binary (absent in
# this image); scripts/basic_gate.sh gate 2 asserts the prediction quality
# and wire format instead. Set VW=/path/to/vw to reproduce the diff.
set -e
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
DATASETS=${DATASETS:-/root/reference/examples/vw-compatibility/datasets}
mkdir -p predictions

NS="--keep B --keep C --keep D --keep F --keep G --keep H --keep L --keep O --keep S --keep U --keep W --keep e --keep f --keep g --keep h --keep i --keep o --keep p --keep q --keep r --keep v --keep x"
REST="-l 0.025 -b 25 --adaptive --sgd --link=logistic --loss_function logistic --power_t 0.35 --l2 0.0 --hash all --vwcompat"

python3 -m fwumious_wabbit_tpu $NS $REST \
    --data "$DATASETS/train.vw" -p predictions/train.fwt.out

if [ -n "$VW" ]; then
    "$VW" $NS -l 0.025 -b 25 --adaptive --sgd --link=logistic \
        --loss_function logistic --power_t 0.35 --l2 0.0 --hash all \
        --data "$DATASETS/train.vw" -p predictions/train.vw.out
    diff -s predictions/train.vw.out predictions/train.fwt.out
else
    echo "DONE — set VW=/path/to/vw to diff against Vowpal Wabbit"
fi
