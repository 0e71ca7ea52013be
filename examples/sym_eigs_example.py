"""Largest eigenvalues of a dense symmetric matrix — the reference's
README front-page example (reference: README.md usage section)."""

import numpy as np

import os
import sys

# Runnable straight from a checkout: put the repo root on the path.
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import spectra_tpu as st


def main():
    # A 1000 x 1000 random symmetric matrix.
    rng = np.random.default_rng(0)
    A = rng.normal(size=(1000, 1000))
    A = A + A.T

    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=3, ncv=6)
    eigs.init()
    nconv = eigs.compute(st.SortRule.LargestAlge)

    if eigs.info() == st.CompInfo.Successful:
        print(f"{nconv} converged eigenvalues:")
        print(eigs.eigenvalues())


if __name__ == "__main__":
    main()
