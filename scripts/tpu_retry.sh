#!/bin/bash
# Retry wrapper for TPU scripts: the axon remote-compile service is slow
# (10-25 min per fresh program, 2026-08-21) and occasionally drops the
# connection ("Broken pipe"). Compiled programs land in JAX_COMPILATION_CACHE_DIR
# on success, so every retry makes forward progress — rerun until the script
# exits 0.
#   scripts/tpu_retry.sh <max_tries> <per_try_timeout_s> <cmd...>
set -u
tries=$1; per=$2; shift 2
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
for i in $(seq 1 "$tries"); do
  echo "=== tpu_retry attempt $i/$tries: $* ===" >&2
  timeout "$per" "$@" && exit 0
  code=$?
  echo "=== attempt $i exited $code; retrying ===" >&2
  if [ "$code" = 124 ] || [ "$code" = 137 ] || [ "$code" = 143 ]; then
    # timeout KILLED the client: the relay wedges the grant for ~5 min
    # ("grant unclaimed past timeout", CLAUDE.md) — retrying sooner just burns
    # the next attempt's budget blocked on the claim handshake
    sleep 300
  else
    sleep 20
  fi
done
exit 1
