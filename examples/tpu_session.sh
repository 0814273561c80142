#!/bin/bash
# Queued real-TPU session (run when the axon tunnel is up). Round-4 queue:
# the fused-kernel + backward numbers, the many-light A/B, the textured-
# room interactive artifact, then the profile/config sweeps.
# Each step logs to /tmp/tpu_*.log.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
timeout 900  python bench.py                     2>&1 | tee /tmp/tpu_bench.log
timeout 900  python bench.py --grad              2>&1 | tee /tmp/tpu_grad.log
timeout 1800 python examples/ab_many_lights.py   2>&1 | tee /tmp/tpu_lights.log
timeout 1800 python examples/phase_sweep.py      2>&1 | tee /tmp/tpu_phases.log
timeout 1200 python examples/orbit.py --size 640x360 --frames 72 \
             --inflight 4 --save-every 4 --out out/orbit \
                                                 2>&1 | tee /tmp/tpu_orbit.log
timeout 1500 python examples/orbit.py --size 640x360 --frames 72 \
             --inflight 4 --save-every 4 --out out/orbit_room \
             --scene /root/reference/examples/assets/ReflectionRoom.glb \
                                                 2>&1 | tee /tmp/tpu_room.log
timeout 1500 python examples/orbit.py --size 1280x720 --frames 48 \
             --inflight 4 --save-every 8 --out out/orbit720 \
                                                 2>&1 | tee /tmp/tpu_720.log
timeout 1800 python examples/eval_configs.py --save \
                                                 2>&1 | tee /tmp/tpu_configs.log
timeout 1200 python examples/profile_frame.py --frames 10 \
                                                 2>&1 | tee /tmp/tpu_prof.log
