"""Pallas TPU kernels (speed-of-light upgrades of the jnp reference ops).

Toggled globally so tests can exercise both paths; defaults on for TPU
backends, off for CPU (where kernels run interpreted and slow).
"""

import os

import jax

_FORCE = os.environ.get("NANO_PEARL_PALLAS")  # "1" force on, "0" force off


def attention_enabled() -> bool:
    if _FORCE is not None:
        return _FORCE == "1"
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
