#!/bin/bash
# Robust TPU job launcher for the flaky axon relay: probe until the backend
# registers, then exec the real command. Usage: tools/tpu_run.sh <cmd...>
set -u
for attempt in $(seq 1 12); do
  if timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "[tpu_run] backend OK (attempt $attempt)" >&2
    exec "$@"
  fi
  echo "[tpu_run] axon backend not ready (attempt $attempt); sleeping 45s" >&2
  sleep 45
done
echo "[tpu_run] giving up after 12 attempts" >&2
exit 1
