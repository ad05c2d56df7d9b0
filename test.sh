#!/bin/sh
# Fast CPU test runner: skip the axon TPU claim at interpreter start
# (PALLAS_AXON_POOL_IPS unset -> sitecustomize skips PJRT registration).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
