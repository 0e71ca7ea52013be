"""Generalized symmetric problem A x = lambda B x in Cholesky mode."""

import numpy as np

import os
import sys

# Runnable straight from a checkout: put the repo root on the path.
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import spectra_tpu as st


def main():
    n = 500
    rng = np.random.default_rng(1)
    A = rng.normal(size=(n, n))
    A = A + A.T
    M = rng.normal(size=(n, n)) * 0.1
    B = M @ M.T + np.eye(n)  # SPD metric

    op = st.DenseSymMatProd.create(A)
    bop = st.DenseCholesky.create(B)
    eigs = st.SymGEigsSolver(op, bop, nev=4, ncv=16)
    eigs.init()
    eigs.compute(st.SortRule.LargestAlge)

    vals = eigs.eigenvalues()
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - B @ vecs * vals[None, :]).max()
    print("eigenvalues:", vals)
    print("||A U - B U L||_inf =", resid)


if __name__ == "__main__":
    main()
