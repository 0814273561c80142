#!/bin/bash
# Queued real-TPU session (run when the axon tunnel is up). Round-4 queue:
# confirm the frame + interactive numbers, then the measurement backlog.
# Each step logs to /tmp/tpu_*.log.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
timeout 900  python bench.py                     2>&1 | tee /tmp/tpu_bench.log
timeout 1200 python examples/orbit.py --size 640x360 --frames 72 \
             --inflight 4 --save-every 4 --out out/orbit \
                                                 2>&1 | tee /tmp/tpu_orbit.log
timeout 1800 python examples/eval_configs.py --save \
                                                 2>&1 | tee /tmp/tpu_configs.log
timeout 1200 python examples/profile_frame.py --frames 10 \
                                                 2>&1 | tee /tmp/tpu_prof.log
timeout 2400 python examples/bench_binned.py \
             --tracers binned,binned_reorder     2>&1 | tee /tmp/tpu_binned.log
