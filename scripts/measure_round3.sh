#!/bin/bash
# Round-3 measurement pass: runs every TPU-gated measurement serially
# (ONE device process at a time — two concurrent claimants starve each
# other through the relay). Each step logs to $LOGDIR and is skippable
# via SKIP_<STEP>=1. Usage:  bash scripts/measure_round3.sh
set -u
LOGDIR=${LOGDIR:-/tmp/measure_r3}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  local skip_var="SKIP_${name^^}"
  if [ "${!skip_var:-0}" = "1" ]; then echo "== $name: skipped"; return; fi
  echo "== $name (timeout ${tmo}s) -> $LOGDIR/$name.log"
  timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
  echo "== $name: rc=$? ($(date +%H:%M:%S))"
  tail -n 8 "$LOGDIR/$name.log" | sed 's/^/   /'
}

# 1. fail fast if the tunnel is down
step tunnel 420 python - <<'EOF'
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
print((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
EOF
grep -q "rc=0" /dev/null 2>/dev/null || true

# 2. single-query latency table (packed CAGRA vs exact tier vs hnsw_cpu)
step latency 2400 python scripts/run_latency.py

# 3. driver headline (fused BF + int8 + IVF + CAGRA contenders)
step bench 2400 python bench.py

# 4. DEEP-10M-class IVF-PQ through the fused PQ scan (+ device refine)
step pq10m 3600 python scripts/run_pq10m.py

# 5. DEEP-100M: streaming build + fused int8 scan + host refine
#    (dataset cache at /root/x100m_f32.npy skips datagen)
step run100m 7200 python scripts/run_100m.py
