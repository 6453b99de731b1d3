#!/bin/bash
# Zero-egress end-to-end CLI smoke: synthetic SRN-layout data -> inception
# stats -> train.py (runner, hooks, eval, checkpoint) -> test.py metrics.
# Exercises the exact reference workflow (/root/reference/README.md
# "Training"/"Testing") with no real SRN data or network access.
set -e
cd "$(dirname "$0")/.."
CFG=configs/new_cfgs/ssdnerf_synth_smoke.py
WD=${WORK_DIR:-work_dirs/ssdnerf_synth_smoke}

echo "== 1/4 synthetic SRN dataset"
JAX_PLATFORMS=cpu python tools/make_synthetic_srn.py /tmp/srn_synth/train \
    --scenes 16 --views 12 --size 64 --seed 0
JAX_PLATFORMS=cpu python tools/make_synthetic_srn.py /tmp/srn_synth/test \
    --scenes 4 --views 12 --size 64 --seed 7

echo "== 2/4 inception statistics (substitute weights in zero-egress images)"
JAX_PLATFORMS=cpu python tools/inception_stat.py "$CFG" \
    --data val_uncond --out /tmp/srn_synth/inception.pkl --batch-size 16

echo "== 3/4 train.py (400 iters, eval + checkpoint hooks)"
python train.py "$CFG" --work-dir "$WD" --seed 0

echo "== 4/4 test.py on the saved checkpoint"
# runner writes $WD/ckpt/iter_*.ckpt and maintains a latest.ckpt symlink
# (ssdnerf_tpu/runner/loop.py save_checkpoint)
CKPT="$WD/ckpt/latest.ckpt"
[ -e "$CKPT" ] || CKPT=$(ls -t "$WD"/ckpt/iter_*.ckpt | head -1)
python test.py "$CFG" "$CKPT" --viz-dir "$WD/viz_test"

echo "e2e smoke OK: work dir $WD"
