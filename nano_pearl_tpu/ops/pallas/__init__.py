"""Pallas TPU kernels (speed-of-light upgrades of the jnp reference ops).

Toggled globally so tests can exercise both paths; defaults on for TPU
backends, off for CPU (where kernels run interpreted and slow).
"""

import os

import jax

_FORCE = os.environ.get("NANO_PEARL_PALLAS")  # "1" force on, "0" force off


def attention_enabled() -> bool:
    # Opt-in (NANO_PEARL_PALLAS=1) until the kernel beats the XLA gather
    # path across the bench shapes; parity is covered by tests either way.
    return _FORCE == "1"
