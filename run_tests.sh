#!/bin/bash
# CPU test runner: skips the axon TPU-relay registration (slow, single-client)
# and forces the 8-fake-device CPU platform the test suite expects.
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
exec python -m pytest "${@:-tests/ -q}"
