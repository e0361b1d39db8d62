#!/bin/bash
# Staged TPU measurement playbook (run as soon as the chip claim is healthy).
#
# Settles the round-3 open items in order of information value:
#   1. drive    — tiny roundtrip proves the chip answers (fast fail)
#   2. inverse  — A/B the NICE/MCF emitters incl. the round-4 finer
#                 per-stage attribution variants
#   3. decode   — A/B the packed skinny-N conv + phase-deconv rewrites
#                 via their kill switches
#   4. train    — fp32 vs master-weights mixed precision (verdict task 3)
#   5. bench    — recapture the headline (rc=0 + spread fields)
#
# Every stage appends to $LOG; stages are independently timeout-bounded so a
# re-wedged claim cannot eat the session.  ONE TPU process at a time
# (CLAUDE.md) — do not run this while anything else holds the chip.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_playbook_$(date +%H%M%S).log}
echo "log: $LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $name rc=$rc" | tee -a "$LOG"
  return $rc
}

# 1. cheap liveness probe: bail early if the claim is still wedged
run drive 420 python -c "
import jax, numpy as np
d = jax.devices()[0]
x = jax.device_put(np.ones((128,128), np.float32), d)
print('chip ok:', d, float(jax.device_get(x @ x).sum()))" || {
  echo 'chip still unavailable — aborting playbook'; exit 1; }

# 2. inverse attribution + emitter A/Bs (shipped scale)
run inverse_core 3000 python tools/profile_inverse.py --rounds 3 \
  --variants full,portable,mcf_identity,nice_identity
run inverse_emitters 3000 python tools/profile_inverse.py --rounds 3 \
  --variants portable,nice_plainout,nice_im2col,nice_packed
run inverse_stages 3600 python tools/profile_inverse.py --rounds 3 \
  --variants portable,nice_no_w1,nice_no_w2,nice_out_center,nice_noact,nice_w2_bf16acc
# fused 3-dot NICE-net Pallas kernel (identical math; first real Mosaic
# lowering happens here, so it gets its own stage)
run inverse_fused_nice 3000 python tools/profile_inverse.py --rounds 3 \
  --variants full,nice_fused,nice_fused_portable_units

# 3. decode emitter A/Bs (kill switches restore the flax emitters; `env`
# form so the switches cannot outlive this stage)
run decode_on 1800 python tools/profile_decode.py --rounds 3
run decode_off 1800 env IPOKE_SMALLN_CONV=0 IPOKE_PHASE_DECONV=0 \
  python tools/profile_decode.py --rounds 3

# 4. train step: fp32 baseline vs master-weights mixed precision
run train_fp32 3600 python tools/measure_train_step.py --steps 5 --rounds 2
run train_mixed 3600 python tools/measure_train_step.py --steps 5 --rounds 2 \
  --mixed-master

# 5. headline bench (shipped scale, with phase split)
run bench 3600 env IPOKE_BENCH_PHASES=1 python bench.py

echo "playbook complete — results in $LOG"
