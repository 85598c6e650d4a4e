"""Input-range ("domain") conventions.

The reference framework passes waveforms in one of two float domains
(reference: model/utils.py:7-19):

  * ``scale``  — floats in [-1, 1)            (what attacks operate in)
  * ``origin`` — int16-valued floats in [-2^15, 2^15)  (what Kaldi models eat)

``check_input_range(x, range_type)`` converts between them using the same
0.9-margin heuristic as the reference so behavior matches bit-for-bit on the
decision of whether to rescale.

NOTE: the heuristic involves a data-dependent predicate.  Inside ``jit`` we
implement it with ``jnp.where`` on the whole array (branch-free), which is
mathematically identical because the two branches differ only by a constant
multiplicative factor.
"""

import jax.numpy as jnp

BITS = 16
ABS_MAX = float(2 ** (BITS - 1))  # 32768.0


def check_input_range(x, range_type: str = "scale", bits: int = BITS):
    """Convert ``x`` to the requested domain (branch-free, jit-safe).

    Mirrors reference model/utils.py:7-19: an array is considered to be in
    the ``scale`` domain iff ``0.9*max(x) <= 1 and 0.9*min(x) >= -1``.
    """
    assert range_type in ("scale", "origin")
    abs_max = float(2 ** (bits - 1))
    is_scale = jnp.logical_and(0.9 * jnp.max(x) <= 1.0, 0.9 * jnp.min(x) >= -1.0)
    if range_type == "origin":
        factor = jnp.where(is_scale, abs_max, 1.0)
    else:
        factor = jnp.where(is_scale, 1.0, 1.0 / abs_max)
    return x * factor


def to_origin(x, bits: int = BITS):
    return check_input_range(x, "origin", bits)


def to_scale(x, bits: int = BITS):
    return check_input_range(x, "scale", bits)
