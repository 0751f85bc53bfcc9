"""Guards for the jvp-capable Pallas entries.

Every ``*_jvp_capable`` kernel entry (attention, block attention, FFN,
modnorm) carries a hand-written forward-mode rule that propagates tangents
only through the ACTIVATION operands — weight/scale tangents are assumed
zero because the one consumer, the sCM loss (reference loss.py:212-220),
differentiates w.r.t. (x, t) with params closed over as constants. The
rules are registered with ``symbolic_zeros=True`` so that contract is
ENFORCED at trace time: a future caller that forward-differentiates w.r.t.
params through these entries gets a loud NotImplementedError instead of a
silently-wrong tangent (r3 ADVICE).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.custom_derivatives import SymbolicZero


def require_zero_tangents(entry: str, **named_tangents) -> None:
    """Raise unless every named tangent is a symbolic zero (trace-time)."""
    bad = [n for n, t in named_tangents.items()
           if not isinstance(t, SymbolicZero)]
    if bad:
        raise NotImplementedError(
            f"{entry}: forward-mode tangents w.r.t. {bad} are not "
            f"implemented — this jvp-capable entry propagates tangents only "
            f"through activation operands (the sCM-loss contract: params "
            f"are constants under jax.jvp). Use the jnp reference path for "
            f"parameter-tangent forward-mode differentiation."
        )


def materialize(t):
    """A kept tangent may still arrive as a symbolic zero; densify it."""
    if isinstance(t, SymbolicZero):
        return jnp.zeros(t.shape, t.dtype)
    return t
