#!/bin/bash
# Round-5 campaign 1: schedule-family unification probes (VERDICT item 1).
# Q: do the mono (grid-free) kernels keep the exact gamma=14 bitwise
# ceiling when the verify stays CLASSIC write-then-read (+vcap=16)?
# Round 4 only measured mono WITH deferred verify (MAT 10-11); decode
# already routes through the same grouped kernel body at r=1, so the
# attention fp schedule may be row-stable across decode/verify.
set -x
cd "$(dirname "$0")/.."
LOG=tools/chiplog/20_r5_sched_unify.log
{
  echo "=== A: mono=1 deferred=0 vcap=16 (ceiling otherwise) $(date)"
  NANO_PEARL_MONO=1 NANO_PEARL_DEFERRED_VERIFY=0 timeout 1700 python bench.py
  echo "rc=$?"
  echo "=== B: mono=1 deferred=1 vcap=16 $(date)"
  NANO_PEARL_MONO=1 NANO_PEARL_DEFERRED_VERIFY=1 timeout 1700 python bench.py
  echo "rc=$?"
  echo "=== done $(date)"
} >> "$LOG" 2>&1
