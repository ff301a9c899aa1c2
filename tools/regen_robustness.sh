#!/bin/sh
# Refresh the turbulence-robustness probe (examples/robustness_turb2.json):
# every committed artifact evaluated deterministically at Dryden level 2
# on the 3-seed protocol. Run serially on the TPU after regen_evals.sh.
set -e
cd "$(dirname "$0")/.."
E="python -m heligym_tpu.learner.evaluate --seeds 0,1,2 --episodes 256 --turb-level 2"
T=/tmp/r5_turbprobe
mkdir -p $T

$E --checkpoint examples/hover4k_policy.npz --task hover \
   --target sea_alt=start --train-num-envs 4096 --json-out $T/hover.json
$E --checkpoint examples/forward_policy.npz --task forward \
   --target sea_alt=start,vel=60 --train-num-envs 512 --json-out $T/forward.json
$E --checkpoint examples/turning_policy.npz --task turning \
   --target sea_alt=start --train-num-envs 512 --json-out $T/turning.json
$E --checkpoint examples/oblique_policy.npz --task oblique \
   --target sea_alt=start,vel=60 --train-num-envs 512 --json-out $T/oblique.json
$E --checkpoint examples/slalom_policy.npz --task slalom \
   --target sea_alt=start --train-num-envs 512 --json-out $T/slalom.json
$E --checkpoint examples/landing25_policy.npz --task landing \
   --target touch_alt=ground --train-num-envs 1024 --start-alt 25 \
   --json-out $T/landing25.json
$E --checkpoint examples/landing_band_policy.npz --task landing \
   --target touch_alt=ground --train-num-envs 2048 --start-band 6:55 \
   --json-out $T/landing_band_6_55.json
$E --checkpoint examples/landing100_policy.npz --task landing \
   --target touch_alt=ground --train-num-envs 4096 --start-band 6:100 \
   --json-out $T/landing100_6_100.json

python - <<'EOF'
import json, os
T = "/tmp/r5_turbprobe"
out = {"description": ("Deterministic artifact evaluation under Dryden "
                       "turbulence level 2 (mean wind unchanged). 3-seed "
                       "protocol (seeds 0,1,2 x 256 episodes, evaluate.py "
                       "--turb-level 2 --seeds); values are cross-seed "
                       "means of the deterministic policy. landing25/band/"
                       "slalom were turbulence-HARDENED in round 5 "
                       "(docs/TRAINING.md)."),
       "results": {}}
for name in ("hover", "forward", "turning", "oblique", "slalom",
             "landing25", "landing_band_6_55", "landing100_6_100"):
    d = json.load(open(f"{T}/{name}.json"))
    a = d["aggregate"]["mean"]
    out["results"][name] = {
        "checkpoint": d["checkpoint"],
        "success_frac": a["success_frac"]["mean"],
        "fail_frac": a["fail_frac"]["mean"],
        "timeout_frac": a["timeout_frac"]["mean"],
        "success_std_across_seeds": a["success_frac"]["std"],
    }
json.dump(out, open("examples/robustness_turb2.json", "w"), indent=1)
print("examples/robustness_turb2.json refreshed")
EOF
