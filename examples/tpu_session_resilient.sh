#!/bin/bash
# Round-4 TPU measurement queue, outage-resilient variant: the axon
# tunnel wedges in phases (dispatch hangs forever while jax.devices()
# still answers — CLAUDE.md), so every step runs under timeout with
# retries and the queue records per-step success so a later re-run
# skips what already landed. Logs: /tmp/tpu_*.log; state: /tmp/tpu_done.
set -u -o pipefail
cd /root/repo
mkdir -p /tmp/tpu_done

run_step() {  # run_step <name> <timeout_s> <tries> <cmd...>
  local name=$1 tmo=$2 tries=$3; shift 3
  if [ -e "/tmp/tpu_done/$name" ]; then echo "SKIP $name (done)"; return 0; fi
  for i in $(seq 1 "$tries"); do
    echo "=== $name attempt $i/$tries $(date +%H:%M:%S) ==="
    if timeout "$tmo" "$@" 2>&1 | tee "/tmp/tpu_$name.log"; then
      # Success heuristic: the step printed a JSON/stats line and did not
      # hit the watchdog skip path.
      if ! grep -q "tunnel unreachable" "/tmp/tpu_$name.log"; then
        touch "/tmp/tpu_done/$name"; return 0
      fi
    fi
    echo "--- $name attempt $i failed/wedged; cooling off 60s"
    sleep 60
  done
  echo "!!! $name exhausted $tries attempts"
  return 1
}

run_step bench   300 8 python bench.py
run_step grad    580 6 python bench.py --grad
run_step lights 1200 4 python examples/ab_many_lights.py
run_step orbit_room 1200 4 python examples/orbit.py --size 640x360 \
    --frames 72 --inflight 4 --save-every 4 --out out/orbit_room \
    --scene /root/reference/examples/assets/ReflectionRoom.glb
run_step phases 1500 3 python examples/phase_sweep.py
run_step orbit  1000 3 python examples/orbit.py --size 640x360 --frames 72 \
    --inflight 4 --save-every 4 --out out/orbit
run_step orbit720 1200 3 python examples/orbit.py --size 1280x720 \
    --frames 48 --inflight 4 --save-every 8 --out out/orbit720
run_step configs 1800 3 python examples/eval_configs.py --save
run_step profile 1200 3 python examples/profile_frame.py --frames 10
echo "=== queue complete $(date +%H:%M:%S) ==="; ls /tmp/tpu_done
