#!/bin/bash
# Run the test suite on the virtual 8-device CPU mesh WITHOUT dialing the
# axon TPU tunnel (every python process otherwise registers with the relay
# at interpreter start via sitecustomize, which can stall concurrent TPU
# work). Usage: tools/pytest_cpu.sh [pytest args...]
cd "$(dirname "$0")/.." || exit 1
if [ $# -eq 0 ]; then set -- tests/ -q; fi
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "$@"
