#!/usr/bin/env bash
# Pending on-chip validation/perf checklist (run when the TPU tunnel is up).
# Each step is independently time-bounded and logs to tools/chiplog/.
# Order matters: cheap smokes first, compile-heavy probes last.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/chiplog
log() { echo "== $(date +%H:%M:%S) $*" | tee -a tools/chiplog/checklist.log; }

# 1. quick smoke: bf16 kernels + flash prefill changed program hashes
log "1. bench --quick"
timeout 1200 python bench.py --quick 2>&1 | tail -3 | tee tools/chiplog/1_quick.log

# 2. Mosaic lowering of the partial kernels (sp path) on ONE device
log "2. sp partial-kernel compile validation"
timeout 1200 python tools/validate_partial_kernels_chip.py 2>&1 | tail -5 | tee tools/chiplog/2_partials.log

# 3. verify-forward breakdown at steady-state context (the 33%-MXU hunt)
log "3. probe_verify_breakdown --ctx 1000"
timeout 2400 python tools/probe_verify_breakdown.py --ctx 1000 2>&1 | tail -20 | tee tools/chiplog/3_verify.log

# 4. fuse_proj A/B
log "4. bench --quick --fuse-proj"
timeout 1200 python bench.py --quick --fuse-proj 2>&1 | tail -3 | tee tools/chiplog/4_fuseproj.log

# 5. int8 KV smoke (in-kernel dequant kernels)
log "5. bench --quick --kv-quant int8"
timeout 1200 python bench.py --quick --kv-quant int8 2>&1 | tail -3 | tee tools/chiplog/5_kvq.log

# 6. full default bench (headline refresh)
log "6. full bench"
timeout 2400 python bench.py 2>&1 | tail -3 | tee tools/chiplog/6_full.log

# 7. gamma 16 ONCE with a huge timeout (compile tarpit probe; persistent
#    cache makes later runs warm). Run LAST -- may eat 45 min.
log "7. gamma 16 probe"
timeout 2700 python bench.py --gamma 16 2>&1 | tail -3 | tee tools/chiplog/7_g16.log

log "checklist done"
