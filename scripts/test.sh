#!/bin/bash
# Run the test suite on CPU with a virtual 8-device mesh.
# The axon TPU plugin registers at interpreter startup (sitecustomize) and
# claims the single TPU seat; tests must not touch it, both for speed and to
# avoid deadlocking a concurrent bench run on the chip.
cd "$(dirname "$0")/.."
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "$@"
