#!/bin/bash
# Full local gate in one command: oracle compare at sf0.01 + full test
# suite. Mirrors what the driver runs per round (CORRECTNESS_r*.json).
set -e
cd "$(dirname "$0")/.."
rm -rf /tmp/graft_gate
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_gate"
python3 tools/compare.py /tmp/graft_gate /root/testdata/sf0.01
sbt -batch test
