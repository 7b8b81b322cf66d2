#!/usr/bin/env bash
# Round-2 on-chip validation/perf checklist (run when the TPU tunnel is
# up). Each step is independently time-bounded, APPENDS full output to
# tools/chiplog/ (never truncated-to-empty: tee gets the whole stream).
# Order: cheap smokes first, compile-heavy probes last. The persistent
# compile cache (.jax_cache/) makes re-runs fast.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/chiplog
log() { echo "== $(date +%H:%M:%S) $*" | tee -a tools/chiplog/checklist.log; }

step() { # step <n_name> <timeout> <cmd...>
  local name="$1" to="$2"; shift 2
  log "$name"
  { timeout "$to" "$@" 2>&1; echo "== rc=$? at $(date +%H:%M:%S)"; } \
    | tee "tools/chiplog/${name}.log" | tail -4
}

# 1. quick smoke: bf16 kernels end-to-end
step 1_quick 1200 python bench.py --quick

# 2. partial-output SP kernels EXECUTED on the chip (not just lowered)
step 2_partials 1800 python tools/validate_partial_kernels_chip.py

# 3. verify-forward breakdown at steady-state context (MFU numbers)
step 3_verify 3000 python tools/probe_verify_breakdown.py --ctx 1000

# 4. fuse_proj A/B
step 4_fuseproj 1200 python bench.py --quick --fuse-proj

# 5. int8 KV smoke (in-kernel dequant kernels)
step 5_kvq 1200 python bench.py --quick --kv-quant int8

# 6. full default bench (headline refresh)
step 6_full 2700 python bench.py

# 7. realistic-acceptance rows (draft-noise; same compiled programs as
#    the full bench -> warm, ~6 min each)
step 7_noise_mat20 1500 python bench.py --draft-noise 0.02
step 8_noise_mat9  1500 python bench.py --draft-noise 0.05
step 9_noise_mat4  1500 python bench.py --draft-noise 0.12

log "checklist done"
