#!/bin/bash
# Wait for the tunneled TPU to respond, then run the round-3 chip chain.
# Probe: a tiny jitted matmul with a hard timeout — after a VM restart the
# tunnel can take a while to (re)attach, and jax.devices() itself blocks
# when the remote side is wedged.
cd "$(dirname "$0")/.."
PROBE='
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print("probe-ok", jax.devices(), float((x @ x)[0, 0]))
'
n=0
until timeout 240 python -c "$PROBE" 2>&1 | grep -q probe-ok; do
  n=$((n+1))
  echo "[chip-wait] probe $n failed ($(date -u +%H:%M:%S)); retrying in 120s" >&2
  sleep 120
done
echo "[chip-wait] chip is live ($(date -u +%H:%M:%S)); starting chain" >&2
bash benchmarks/flagship_60m.sh artifacts/flagship
bash benchmarks/convergence_9m.sh artifacts/conv9m
bash benchmarks/round3_chip_queue.sh artifacts
