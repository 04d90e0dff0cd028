#!/bin/bash
# Probe the tunneled TPU backend once (bounded). Exit 0 = tunnel ALIVE,
# exit 1 = still dead. Used as a cheap relaunchable watcher while the
# tunnel is down; pair with round5_measurements.sh the moment it exits 0.
cd "$(dirname "$0")/.."
timeout 140 python -c "
import sys
import __graft_entry__ as g
n = g._probe_real_devices(timeout_s=120)
print('tunnel devices:', n)
sys.exit(0 if n else 1)
"
