#!/bin/bash
# CPU test runner: skips the axon TPU-relay registration (slow, single-client)
# and forces the 8-fake-device CPU platform the test suite expects.
# (tests/conftest.py re-asserts all of this; unset here for belt+braces —
# the relay treats ANY set value, even empty, as enabled.)
#
# Tiers:
#   ./run_tests.sh            fast tier (deselects `slow`; ~7 min warm cache)
#   ./run_tests.sh --all      everything incl. multi-minute compile tests
#   ./run_tests.sh <pytest args...>   passthrough
unset PALLAS_AXON_POOL_IPS
unset PALLAS_AXON_REMOTE_COMPILE
export JAX_PLATFORMS=cpu
if [ $# -eq 0 ]; then
  set -- tests/ -q -m "not slow"
elif [ "$1" = "--all" ]; then
  shift
  set -- tests/ -q "$@"
fi
exec python -m pytest "$@"
