#!/bin/bash
# FFM end-to-end example: generate the herbivore/carnivore data, train LR+FFM,
# export inference weights, evaluate on the hard (unseen-combination) test set.
# Mirrors the reference's examples/ffm/run.sh flags.
set -e
cd "$(dirname "$0")"

python3 generate.py --num_animals 300 --num_foods 200 --num_train_examples 30000

NS="--keep A --keep B --interactions AB --ffm_k 10 --ffm_field A --ffm_field B"
REST="-l 0.1 -b 25 -c --sgd --loss_function logistic --link logistic --power_t 0.0 --l2 0.0 --hash all --noconstant --fwt_batch_size 256"
FWT="python3 -m fwumious_wabbit_tpu"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p models predictions
$FWT $NS $REST --data datasets/train.vw -p predictions/training.txt \
     -f models/full.fwt --save_resume
$FWT $NS $REST -i models/full.fwt --convert_inference_regressor models/inference.fwt
$FWT $NS $REST -i models/inference.fwt -t --data datasets/test-hard.vw \
     -p predictions/hard.txt

python3 - <<'EOF'
preds = [float(x) for x in open("predictions/hard.txt")]
labels = [1 if l.split()[0] == "1" else 0 for l in open("datasets/test-hard.vw")]
tp = sum(p >= 0.5 and y for p, y in zip(preds, labels))
tn = sum(p < 0.5 and not y for p, y in zip(preds, labels))
pos = sum(labels)
ba = 0.5 * (tp / max(pos, 1) + tn / max(len(labels) - pos, 1))
print(f"hard-test balanced accuracy: {ba:.4f}")
EOF
