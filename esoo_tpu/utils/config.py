"""Global dtype / device policy.

The reference exposed a single `device='cpu'|'cuda:n'` knob on its inner
optimizer (partial_unitary_projection_optimizer.py:38-40).  Here the policy
is dtype-centric: float64 everywhere by default (jax x64 enabled at package
import), with an opt-in fast mode that runs the TPU hot loops in
float32/complex64 while final energies are re-evaluated in float64 on host.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class Precision:
    real_dtype: object = jnp.float64
    complex_dtype: object = jnp.complex128


_precision = Precision()


def set_precision(mode: str = "high"):
    """mode: 'high' (f64/c128) or 'fast' (f32/c64 hot loops)."""
    global _precision
    if mode == "high":
        _precision = Precision(jnp.float64, jnp.complex128)
    elif mode == "fast":
        _precision = Precision(jnp.float32, jnp.complex64)
    else:
        raise ValueError(f"unknown precision mode {mode!r}")


def real_dtype():
    return _precision.real_dtype


def complex_dtype():
    return _precision.complex_dtype


class precision_mode:
    """Context manager: temporarily switch the dtype policy.

    with precision_mode('fast'):   # f32/c64 hot loops (TPU-native speed)
        ...
    """

    def __init__(self, mode: str):
        self.mode = mode

    def __enter__(self):
        global _precision
        self._saved = _precision
        set_precision(self.mode)
        return self

    def __exit__(self, *exc):
        global _precision
        _precision = self._saved
        return False
