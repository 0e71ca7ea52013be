"""Floating-point traits.

TPU-native stand-in for the reference's TypeTraits
(reference: include/Spectra/Util/TypeTraits.h): machine epsilon, a
guarded smallest-normal, and the derived thresholds the ARPACK-style
convergence and re-orthogonalization rules depend on.
"""

import jax.numpy as jnp
import numpy as np


def real_dtype(dtype):
    """The real scalar type underlying ``dtype`` (identity for reals)."""
    return jnp.finfo(dtype).dtype


def is_complex(dtype) -> bool:
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


def complex_dtype(dtype):
    """The complex type whose real part is ``dtype``."""
    d = jnp.dtype(dtype)
    if jnp.issubdtype(d, jnp.complexfloating):
        return d
    return jnp.dtype({4: np.complex64, 8: np.complex128}[d.itemsize])


def eps(dtype) -> float:
    """Machine epsilon of the real type underlying ``dtype``."""
    return float(jnp.finfo(dtype).eps)


def near_zero(dtype) -> float:
    """10x smallest normal: 'a very small value whose reciprocal does not
    overflow' (reference: HermEigsBase.h:181-184)."""
    return float(jnp.finfo(dtype).tiny) * 10.0


def eps23(dtype) -> float:
    """eps^(2/3), the ARPACK convergence-threshold floor
    (reference: HermEigsBase.h:160-166)."""
    return eps(dtype) ** (2.0 / 3.0)
