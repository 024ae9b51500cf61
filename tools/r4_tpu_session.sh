#!/bin/bash
# Round-4 TPU measurement session. Run with NO concurrent CPU-heavy jobs
# (the tunnel relay starves). Steps:
#   1. smoke-scale map_step decomposition (kernel targets)
#   2. full bench (warms persistent cache for the driver + numbers)
# Usage: bash tools/r4_tpu_session.sh [out_prefix]
set -u
PFX=${1:-/tmp/r4}
cd /root/repo

echo "=== probe ==="
timeout 420 python - <<'EOF'
import time, numpy as np, jax, jax.numpy as jnp
x = jnp.zeros(8); np.asarray(x + 1)
t0 = time.time()
for _ in range(8):
    np.asarray(jnp.sum(x))
print("link_rtt_ms", round((time.time()-t0)/8*1e3, 1))
a = jnp.ones((4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda a: a @ a); np.asarray(mm(a)[:1,:1])
t0 = time.time()
for _ in range(10): out = mm(a)
np.asarray(out[:1,:1])
print("matmul_tflops", round(2*4096**3/((time.time()-t0)/10)/1e12, 1))
EOF

echo "=== map_step profile (smoke scale) ==="
timeout 1800 python tools/map_step_profile.py --json --gaussians 32768 \
  --cams 8 --hw 240,320 --K 128 --ssim --opt-poses --dense \
  | tee "$PFX"_map_step_smoke.json

echo "=== bench (learned,oracle) ==="
timeout 7200 python bench.py 2>"$PFX"_bench.err | tee "$PFX"_bench.jsonl
echo "=== done ==="
