#!/bin/bash
# One-shot serial measurement battery for when the TPU tunnel is healthy.
# Runs each probe SEQUENTIALLY (shared-chip protocol: never overlap our
# own TPU jobs) and leaves JSON/text artifacts under /tmp/battery/.
#
# Usage: bash tools/tpu_battery.sh [quick|full]
set -u
mkdir -p /tmp/battery
cd /root/repo
MODE="${1:-quick}"

echo "=== tunnel probe ===" | tee /tmp/battery/log
timeout 300 python - <<'EOF' 2>&1 | tee -a /tmp/battery/log
import time, numpy as np
t0 = time.time(); import jax; import jax.numpy as jnp
d = jax.devices(); print("devices", d, "init_s", round(time.time()-t0, 1))
x = jnp.ones((4096, 4096), jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
f(x).block_until_ready()
t0 = time.time(); n = 8
for _ in range(n):
    y = f(x)
y.block_until_ready()
dt = (time.time()-t0)/n
print("matmul_tflops", round(2*4096**3/dt/1e12, 1))
t0 = time.time()
for _ in range(5):
    np.asarray(jnp.zeros(8) + 1.0)
print("rtt_ms", round((time.time()-t0)/5*1000, 1))
EOF
[ ${PIPESTATUS[0]} -ne 0 ] && { echo "TUNNEL DOWN — aborting battery"; exit 1; }

echo "=== kernel bench ===" | tee -a /tmp/battery/log
timeout 1200 python tools/kernel_bench.py --json > /tmp/battery/kernel_bench.json 2>/tmp/battery/kb.err
cat /tmp/battery/kernel_bench.json | tee -a /tmp/battery/log

echo "=== map_step profile (smoke scale) ===" | tee -a /tmp/battery/log
timeout 1200 python tools/map_step_profile.py --json --gaussians 32768 --cams 5 --hw 240,320 \
  > /tmp/battery/map_step_smoke.json 2>/tmp/battery/ms1.err
cat /tmp/battery/map_step_smoke.json | tee -a /tmp/battery/log

echo "=== map_step profile (Replica scale) ===" | tee -a /tmp/battery/log
timeout 1800 python tools/map_step_profile.py --json --gaussians 131072 --cams 12 --hw 320,640 \
  > /tmp/battery/map_step_replica.json 2>/tmp/battery/ms2.err
cat /tmp/battery/map_step_replica.json | tee -a /tmp/battery/log

if [ "$MODE" = "full" ]; then
  echo "=== tracking profile ===" | tee -a /tmp/battery/log
  timeout 1200 python tools/tracking_profile.py --json > /tmp/battery/tracking.json 2>/tmp/battery/tp.err
  cat /tmp/battery/tracking.json | tee -a /tmp/battery/log

  echo "=== bench warm x2 ===" | tee -a /tmp/battery/log
  timeout 1800 python bench.py > /tmp/battery/bench1.json 2>/tmp/battery/b1.err
  tail -1 /tmp/battery/bench1.json | tee -a /tmp/battery/log
  timeout 1800 python bench.py > /tmp/battery/bench2.json 2>/tmp/battery/b2.err
  tail -1 /tmp/battery/bench2.json | tee -a /tmp/battery/log
fi
echo "battery done" | tee -a /tmp/battery/log
