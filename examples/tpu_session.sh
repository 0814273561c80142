#!/bin/bash
# Queued real-TPU measurement session (run when the axon tunnel is up).
# Each step logs to /tmp/tpu_*.log; review before flipping defaults.
set -x
cd /root/repo
timeout 900 python bench.py                      2>&1 | tee /tmp/tpu_bench.log
timeout 900 python examples/mem_audit.py --taa pallas \
                                                 2>&1 | tee /tmp/tpu_mem.log
timeout 1200 python examples/ab_taa.py           2>&1 | tee /tmp/tpu_taa.log
timeout 1800 python examples/ab_history.py       2>&1 | tee /tmp/tpu_hist.log
timeout 1800 python examples/bench_binned.py --subdiv 6 \
                                                 2>&1 | tee /tmp/tpu_binned.log
