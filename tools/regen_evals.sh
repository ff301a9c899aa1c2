#!/bin/sh
# Regenerate every committed artifact eval with the standard multi-seed
# protocol (learner.evaluate --seeds 0,1,2 --episodes 256, both mean and
# stochastic policies, per-seed + aggregate stats) — round-4 verdict #3:
# one shared seed set makes single-seed cherry-picking impossible.
# Run serially on the TPU (one process at a time); then tools/scoreboard.py.
set -e
cd "$(dirname "$0")/.."
E="python -m heligym_tpu.learner.evaluate --seeds 0,1,2 --episodes 256"

$E --checkpoint examples/hover4k_policy.npz --task hover \
   --target sea_alt=start --train-num-envs 4096 \
   --json-out examples/hover4k_eval.json
$E --checkpoint examples/forward_policy.npz --task forward \
   --target sea_alt=start,vel=60 --train-num-envs 512 \
   --json-out examples/forward_eval.json
$E --checkpoint examples/turning_policy.npz --task turning \
   --target sea_alt=start --train-num-envs 512 \
   --json-out examples/turning_eval.json
$E --checkpoint examples/oblique_policy.npz --task oblique \
   --target sea_alt=start,vel=60 --train-num-envs 512 \
   --json-out examples/oblique_eval.json
$E --checkpoint examples/slalom_policy.npz --task slalom \
   --target sea_alt=start --train-num-envs 512 \
   --json-out examples/slalom_eval.json
$E --checkpoint examples/landing25_policy.npz --task landing \
   --target touch_alt=ground --train-num-envs 1024 --start-alt 25 \
   --json-out examples/landing25_eval.json
$E --checkpoint examples/landing_band_policy.npz --task landing \
   --target touch_alt=ground --train-num-envs 2048 --start-band 6:55 \
   --json-out examples/landing_band_eval.json
$E --checkpoint examples/landing100_policy.npz --task landing \
   --target touch_alt=ground --train-num-envs 4096 --start-band 6:100 \
   --json-out examples/landing100_eval.json
$E --checkpoint examples/multitask_policy.npz --tasks hover,forward \
   --target sea_alt=start,vel=60 --train-num-envs 1024 \
   --json-out examples/multitask_eval.json
python -m heligym_tpu.learner.evaluate --seeds 0,1,2 --episodes 512 \
   --checkpoint examples/multitask4_policy.npz \
   --tasks hover,forward,turning,oblique \
   --target sea_alt=start,vel=60 --train-num-envs 1024 \
   --json-out examples/multitask4_eval.json
python tools/scoreboard.py
echo "all evals regenerated"
