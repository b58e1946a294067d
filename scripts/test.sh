#!/bin/sh
# Run the test suite on CPU with the axon TPU plugin fully disabled
# (see .claude/skills/verify/SKILL.md for why).
cd "$(dirname "$0")/.." || exit 1
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
