"""Eigenvalue selection rules and sorting.

TPU-native equivalent of the reference's selection-rule machinery
(reference: include/Spectra/Util/SelectionRule.h:33-296). The sort key
("target") convention is identical: keys are constructed so that an
ascending sort puts the *wanted* eigenvalues first. ``BothEnds``
sorts by largest-algebraic and then interleaves
Largest => Smallest => 2nd largest => 2nd smallest => ...

Everything here is jittable with a static ``SortRule``.
"""

import enum

import jax.numpy as jnp
import numpy as np


class SortRule(enum.Enum):
    """Selection rule for desired eigenvalues."""

    LargestMagn = 0
    LargestReal = 1
    LargestImag = 2
    LargestAlge = 3
    SmallestMagn = 4
    SmallestReal = 5
    SmallestImag = 6
    SmallestAlge = 7
    BothEnds = 8


def sort_target(selection: SortRule, values):
    """Return the ascending-sort key for ``values`` under ``selection``.

    Smaller key == more wanted. Mirrors ``SortingTarget``
    (reference: Util/SelectionRule.h:68-185): e.g. LargestMagn -> -|x|.
    """
    v = jnp.asarray(values)
    is_complex = jnp.iscomplexobj(v)
    if selection == SortRule.LargestMagn:
        return -jnp.abs(v)
    if selection == SortRule.SmallestMagn:
        return jnp.abs(v)
    if selection == SortRule.LargestReal:
        return -v.real
    if selection == SortRule.SmallestReal:
        return v.real
    if selection == SortRule.LargestImag:
        if not is_complex:
            raise ValueError("LargestImag requires complex eigenvalues")
        return -jnp.abs(v.imag)
    if selection == SortRule.SmallestImag:
        if not is_complex:
            raise ValueError("SmallestImag requires complex eigenvalues")
        return jnp.abs(v.imag)
    if selection in (SortRule.LargestAlge, SortRule.BothEnds):
        if is_complex:
            raise ValueError("algebraic sort rules require real eigenvalues")
        return -v
    if selection == SortRule.SmallestAlge:
        if is_complex:
            raise ValueError("algebraic sort rules require real eigenvalues")
        return v
    raise ValueError(f"unsupported selection rule {selection}")


def both_ends_permutation(length: int) -> np.ndarray:
    """Static interleave permutation for ``BothEnds``.

    Applied on top of a largest-algebraic order: even output slots take
    from the left (large values), odd slots from the right (small ones)
    (reference: Util/SelectionRule.h:262-285).
    """
    i = np.arange(length)
    return np.where(i % 2 == 0, i // 2, length - 1 - i // 2)


def argsort(selection: SortRule, values, length: int | None = None):
    """Indices sorting ``values`` so the wanted eigenvalues come first.

    jittable; ``selection`` and ``length`` must be static.
    Mirrors ``Spectra::argsort`` (reference: Util/SelectionRule.h:227-288).
    """
    v = jnp.asarray(values)
    if length is None:
        length = v.shape[0]
    v = v[:length]
    key = sort_target(selection, v)
    ind = jnp.argsort(key, stable=True)
    if selection == SortRule.BothEnds:
        ind = ind[both_ends_permutation(length)]
    return ind


def sort_key_np(selection: SortRule, values) -> np.ndarray:
    """Numpy twin of :func:`sort_target`: ascending-sort key, smaller ==
    more wanted (reference: Util/SelectionRule.h:68-185)."""
    v = np.asarray(values)
    is_complex = np.iscomplexobj(v)
    if selection == SortRule.LargestMagn:
        return -np.abs(v)
    if selection == SortRule.SmallestMagn:
        return np.abs(v)
    if selection == SortRule.LargestReal:
        return -v.real
    if selection == SortRule.SmallestReal:
        return v.real
    if selection == SortRule.LargestImag:
        return -np.abs(v.imag)
    if selection == SortRule.SmallestImag:
        return np.abs(v.imag)
    if selection in (SortRule.LargestAlge, SortRule.BothEnds):
        if is_complex:
            raise ValueError("algebraic sort rules require real eigenvalues")
        return -v
    if selection == SortRule.SmallestAlge:
        if is_complex:
            raise ValueError("algebraic sort rules require real eigenvalues")
        return v
    raise ValueError(f"unsupported selection rule {selection}")


def argsort_np(selection: SortRule, values) -> np.ndarray:
    """Numpy twin of :func:`argsort` for host-driven paths (runtimes
    where complex arrays cannot touch the accelerator)."""
    v = np.asarray(values)
    ind = np.argsort(sort_key_np(selection, v), kind="stable")
    if selection == SortRule.BothEnds:
        ind = ind[both_ends_permutation(len(v))]
    return ind
