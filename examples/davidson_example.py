"""Davidson (DPR Jacobi-Davidson) on a diagonally dominant matrix —
counterpart of the reference's DavidsonSymEigs example
(reference: examples/DavidsonSymEigs_example.cpp)."""

import numpy as np

import os
import sys

# Runnable straight from a checkout: put the repo root on the path.
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import spectra_tpu as st


def main():
    n = 1000
    rng = np.random.default_rng(3)
    A = rng.normal(size=(n, n)) * 0.1
    A = (A + A.T) / 2
    np.fill_diagonal(A, np.arange(1.0, n + 1))

    op = st.DenseSymMatProd.create(A)
    solver = st.DavidsonSymEigsSolver(op, nev=4)
    nconv = solver.compute(st.SortRule.LargestAlge, maxit=100, tol=1e-9)

    print("info:", solver.info(), "converged:", nconv)
    print("eigenvalues:", solver.eigenvalues())


if __name__ == "__main__":
    main()
