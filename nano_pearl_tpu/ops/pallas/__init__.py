"""Pallas TPU kernels (speed-of-light upgrades of the jnp reference ops).

Toggled globally so tests can exercise both paths; defaults on for TPU
backends, off for CPU (where kernels run interpreted and slow).
"""

import os

import jax

_FORCE = os.environ.get("NANO_PEARL_PALLAS")  # "1" force on, "0" force off


def attention_enabled(platform: str | None = None) -> bool:
    # Default ON for TPU: the XLA gather path materializes/copies the
    # whole cache per layer inside compiled loops (measured 19.3 ->
    # 2.36 ms/step for an 18L decode at 265-block cache when switching
    # to the kernel). CPU runs the jnp path (kernels would interpret).
    # ``platform``: the platform of the devices that will actually run
    # the op (a CPU dry-run mesh can coexist with a TPU default backend).
    if _FORCE is not None:
        return _FORCE == "1"
    if platform is not None:
        return platform not in ("cpu",)
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
