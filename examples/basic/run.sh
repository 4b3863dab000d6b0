#!/bin/bash
# The reference's examples/basic flow (reference: examples/basic/run.sh) on
# this engine, over the reference's own checked-in dataset (read-only).
# Trains the 21-interaction + 22-keep config and writes train-pass
# predictions; scripts/basic_gate.sh is the asserting CI version.
set -e
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
DATASETS=${DATASETS:-/root/reference/examples/basic/datasets}
mkdir -p models predictions

NS="--interactions 4G --interactions 4GHX --interactions 4GUW --interactions 4K --interactions 4c --interactions 4go --interactions 4v --interactions BC --interactions BD --interactions BGO --interactions BX --interactions CO --interactions DG --interactions DW --interactions GU --interactions Gx --interactions KR --interactions MN --interactions UW --interactions Ug --interactions eg --keep B --keep C --keep D --keep F --keep G --keep H --keep L --keep O --keep S --keep U --keep W --keep e --keep f --keep g --keep h --keep i --keep o --keep p --keep q --keep r --keep v --keep x"
REST="-l 0.025 -b 25 --adaptive --sgd --link=logistic --loss_function logistic --power_t 0.39 --l2 0.0 --hash all"

python3 -m fwumious_wabbit_tpu $NS $REST \
    --data "$DATASETS/train.vw" \
    -p predictions/train.out -f models/trained.fwt --save_resume
echo "DONE — predictions in predictions/train.out, model in models/trained.fwt"
