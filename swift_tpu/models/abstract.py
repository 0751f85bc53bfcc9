"""Model API conventions + small shared helpers.

Parity with the reference abstract layer (reference:
src/swift/models/abstract.py:12-82). In the functional design the "abstract
network" is a CALL CONTRACT rather than a base class — every backbone is a
flax module with:

    __call__(x, t, auxiliary=None, jvp=False, return_logvar=False)
      x: (B, H, W, in_channels) NHWC
      t: () or (B,) timesteps
      -> (B, H, W, out_channels) fp32 [, logvar (B,) when requested]

plus constructor fields ``img_resolution / in_channels / out_channels``
(enforced by the precond builders in swift_tpu.factory).
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import jax


def shape_2d(value: Union[int, Sequence[int]]) -> tuple[int, int]:
    """Normalize int-or-pair shapes (reference Shape2D, abstract.py:42-62)."""
    if isinstance(value, int):
        return (value, value)
    t = tuple(int(v) for v in value)
    if len(t) != 2:
        raise ValueError(f"expected a 2D shape, got {value!r}")
    return t


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "tanh": jax.nn.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "leaky_relu": jax.nn.leaky_relu,
    "softplus": jax.nn.softplus,
}


def get_activation(name: str) -> Callable:
    """Activation registry (reference abstract.py:69-82)."""
    key = name.lower()
    if key not in _ACTIVATIONS:
        raise ValueError(
            f"unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}"
        )
    return _ACTIVATIONS[key]
