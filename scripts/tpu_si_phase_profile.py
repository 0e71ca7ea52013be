"""Phase breakdown of the 1M shift-invert: where does the wall go?"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

import spectra_tpu as st  # noqa: E402
from spectra_tpu.util.rng import SimpleRandom  # noqa: E402


def main(g=1000):
    t = {}
    t0 = time.perf_counter()
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
    n = A.shape[0]
    v0 = SimpleRandom(0).random_vec(n)
    t["assemble_host"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    op = st.SparseSymShiftSolve.create(A, method="mg")
    t["create"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    op = op.set_shift(0.0)
    t["set_shift"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    eigs = st.SymEigsShiftSolver.from_factored(op, 10, 30, 0.0)
    eigs.set_matvec_granularity(True)
    eigs.init(v0)
    t["init"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    nconv = eigs.compute(st.SortRule.LargestMagn, maxit=50, tol=1e-10)
    t["compute"] = time.perf_counter() - t0
    t["nconv"] = int(nconv)
    t["nops"] = eigs.num_operations()
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in t.items()}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
