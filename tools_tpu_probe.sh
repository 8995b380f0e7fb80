#!/bin/bash
# Poll the axon TPU relay until a tiny jit executes; write status when up.
# Usage: bash tools_tpu_probe.sh  (run in background; writes /tmp/tpu_status)
while true; do
  out=$(timeout 240 python - <<'EOF' 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
print("TPU_OK", jax.devices()[0], float((x @ x).sum()))
EOF
)
  if echo "$out" | grep -q TPU_OK; then
    echo "$(date -u +%H:%M:%S) $out" > /tmp/tpu_status
    echo "TPU relay is UP: $out"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) down" >> /tmp/tpu_probe.log
  sleep 120
done
