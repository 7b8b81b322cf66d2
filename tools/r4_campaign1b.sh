#!/bin/bash
# Re-run of campaign 1 rows after the round-time-calibration fix
# (commit "Adaptive gamma: measured round-time model...") — the first
# attempt compiled gamma programs inside the timed window.
cd /root/repo || exit 1
L=tools/chiplog/11_round4.log
{
  echo "=== adaptive gamma RETRY (calibrated) noise 0.01 [$(date -u +%H:%M:%S)] ==="
  timeout 2400 python bench.py --gamma -1 --draft-noise 0.01
  echo "=== adaptive gamma RETRY (calibrated) noise 0.02 [$(date -u +%H:%M:%S)] ==="
  timeout 2400 python bench.py --gamma -1 --draft-noise 0.02
  echo "=== moe RETRY (dense-schedule verify) [$(date -u +%H:%M:%S)] ==="
  timeout 2400 python bench.py --moe
  echo "CAMPAIGN1B_DONE [$(date -u +%H:%M:%S)]"
} >> "$L" 2>&1
