#!/usr/bin/env bash
# Multi-host TPU pod launch — the analog of the reference's SLURM script
# (EXECUTE/slurm_submit): one process per TPU host, all running the same
# command; JAX's coordination service discovers the cluster from the TPU
# runtime environment (no explicit coordinator needed on Cloud TPU).
#
# Usage (on each host of the slice, e.g. via `gcloud compute tpus tpu-vm
# ssh --worker=all --command="bash scripts/launch_pod.sh run.json"`):
set -euo pipefail

CONFIG="${1:-run.json}"

export JAX_NUM_PROCESSES="${JAX_NUM_PROCESSES:-$(python - <<'PY'
import os
print(os.environ.get("TPU_WORKER_HOSTNAMES", "localhost").count(",") + 1)
PY
)}"

exec python -m hybrid9_tpu run --config "$CONFIG" --shard \
    --cache-dir "${H9TPU_CACHE:-.jax_cache}"
