from spectra_tpu.solvers.sym_eigs import SymEigsSolver

__all__ = ["SymEigsSolver"]
