#!/bin/bash
# Validation of the sequence-chunked verify at bs=32 gamma=14: if the
# class-boundary theory holds, MAT rises 12.15 -> ~14.0 at roughly one
# extra weight stream per round (two 224-row chunks instead of one
# 448-row verify).
cd /root/repo || exit 1
L=tools/chiplog/11_round4.log
{
  echo "=== verify_group_cap=16 bs=32 ceiling [$(date -u +%H:%M:%S)] ==="
  NANO_PEARL_VERIFY_GROUP_CAP=16 timeout 2400 python bench.py
  echo "CAMPAIGN7_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
