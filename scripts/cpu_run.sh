#!/bin/bash
# Run a command on the true host CPU backend, outside the axon TPU relay.
# The session registers the axon PJRT plugin in every python process via a
# sitecustomize hook (PYTHONPATH=/root/.axon_site) and IGNORES JAX_PLATFORMS,
# so anything meant to run on CPU must strip the hook + its env first
# (same sanitization as tests/conftest.py).
exec env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
    -u PALLAS_AXON_TPU_GEN -u AXON_LOOPBACK_RELAY \
    PYTHONPATH= JAX_PLATFORMS=cpu "$@"
