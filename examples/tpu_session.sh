#!/bin/bash
# Queued real-TPU session (run when the axon tunnel is up). Round-2 queue:
# artifacts first (parity render, live-loop evidence), then measurements.
# Each step logs to /tmp/tpu_*.log; review before flipping defaults.
set -x
cd /root/repo
timeout 900 python bench.py                      2>&1 | tee /tmp/tpu_bench.log
timeout 1800 python examples/parity_report.py --json \
                                                 2>&1 | tee /tmp/tpu_parity.log
timeout 1200 python examples/orbit.py --size 640x360 --frames 72 --no-save \
                                                 2>&1 | tee /tmp/tpu_orbit.log
timeout 1800 python examples/eval_configs.py --save \
                                                 2>&1 | tee /tmp/tpu_configs.log
timeout 1800 python examples/bench_instances.py  2>&1 | tee /tmp/tpu_inst.log
