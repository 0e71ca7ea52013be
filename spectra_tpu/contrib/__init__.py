"""Extras built on top of the core solvers (reference: contrib/)."""

from spectra_tpu.contrib.partial_svd import PartialSVDSolver
from spectra_tpu.contrib.lobpcg import LOBPCGSolver

__all__ = ["PartialSVDSolver", "LOBPCGSolver"]
