"""Authentic ARPACK on the g=243 north-star matrix (100.1M nnz).

VERDICT r4 item #2: the capability headline (20/20 multiplicity-
certified smallest vs ARPACK's 14/20 at g=64) was substantiated only at
g=64; this script runs — or honestly records the infeasibility of —
scipy's authentic ARPACK (eigsh) on the full g=243 matrix
(n = 14,348,907, nnz = 100,088,055), mirroring the reference's
benchmark contract (reference: benchmark/main.cpp:109-125 races
Spectra vs ARPACK F77 on identical matrices).

Two routes, each in a child process with wall-clock timeout and peak
RSS capture:
  * shift-invert (eigsh sigma=0 which=LM ncv=40) — the route our
    solver uses; on the host this is a SuperLU factorization of a
    3-D 14.3M-node stencil, whose nested-dissection fill is O(n^{4/3})
    (~10^10 nonzeros expected -> far beyond 125 GB RAM / any
    reasonable wall).
  * plain Lanczos (eigsh which=SA ncv=40, maxiter-capped) — memory-
    feasible, but convergence is gap-limited: the smallest eigenvalue
    gap at g=243 is ~3 * (mu_2 - mu_1) ~ 2.5e-4 abs in a spectrum of
    width 12.

Output: one JSON line per route, appended to
results/arpack_northstar_g243.json + raw child logs in results/.

Usage: python scripts/arpack_northstar_g243.py [timeout_s_si timeout_s_sa]
"""

import json
import os
import re
import subprocess
import sys
import time

RESULTS = "/root/repo/results"

CHILD = r"""
import json, resource, sys, time
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

sys.path.insert(0, "/root/repo")
from spectra_tpu.util.rng import SimpleRandom

mode = sys.argv[1]
g = int(sys.argv[2])
maxiter = int(sys.argv[3])

l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g), dtype=np.float64)
e = sps.eye(g)
A = (sps.kron(sps.kron(l1, e), e) + sps.kron(sps.kron(e, l1), e)
     + sps.kron(sps.kron(e, e), l1)).tocsc()
n = A.shape[0]
v0 = SimpleRandom(0).random_vec(n)
print(json.dumps({"built": True, "n": n, "nnz": int(A.nnz)}), flush=True)

t0 = time.perf_counter()
try:
    if mode == "si":
        w = spla.eigsh(A, k=20, sigma=0.0, which="LM", ncv=40, tol=1e-10,
                       maxiter=maxiter, return_eigenvectors=False, v0=v0)
    else:
        w = spla.eigsh(A, k=20, which="SA", ncv=40, tol=1e-10,
                       maxiter=maxiter, return_eigenvectors=False, v0=v0)
    res = {"mode": mode, "ok": True, "nconv": int(len(w)),
           "evals": sorted(float(x) for x in w)}
except spla.ArpackNoConvergence as exc:
    res = {"mode": mode, "ok": False, "err": "ArpackNoConvergence",
           "nconv": int(len(exc.eigenvalues)),
           "evals": sorted(float(x) for x in exc.eigenvalues)}
except MemoryError as exc:
    res = {"mode": mode, "ok": False, "err": "MemoryError: %s" % exc}
except Exception as exc:
    res = {"mode": mode, "ok": False,
           "err": "%s: %s" % (type(exc).__name__, str(exc)[:300])}
res["wall_s"] = round(time.perf_counter() - t0, 1)
res["peak_rss_gb"] = round(
    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
print(json.dumps(res), flush=True)
"""


def run_child(mode, g, maxiter, timeout_s, tag):
    log = os.path.join(RESULTS, f"arpack_g{g}_{mode}.log")
    t0 = time.perf_counter()
    rss_peak_gb = 0.0
    with open(log, "w") as fh:
        proc = subprocess.Popen(
            [sys.executable, "-c", CHILD, mode, str(g), str(maxiter)],
            stdout=fh, stderr=subprocess.STDOUT,
        )
        timed_out = False
        while proc.poll() is None:
            try:
                with open(f"/proc/{proc.pid}/status") as sf:
                    m = re.search(r"VmHWM:\s*(\d+) kB", sf.read())
                    if m:
                        rss_peak_gb = max(rss_peak_gb,
                                          int(m.group(1)) / 1e6)
            except OSError:
                pass
            if time.perf_counter() - t0 > timeout_s:
                timed_out = True
                proc.kill()
                proc.wait()
                break
            time.sleep(5)
    wall = round(time.perf_counter() - t0, 1)
    out = {"tag": tag, "mode": mode, "g": g, "maxiter": maxiter,
           "timeout_s": timeout_s, "wall_s": wall, "timed_out": timed_out,
           "monitor_peak_rss_gb": round(rss_peak_gb, 2)}
    with open(log) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out.update(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def main():
    os.makedirs(RESULTS, exist_ok=True)
    t_si = int(sys.argv[1]) if len(sys.argv) > 1 else 7200
    t_sa = int(sys.argv[2]) if len(sys.argv) > 2 else 5400
    results = []
    # Route 1: shift-invert (the solver-equivalent route).
    results.append(run_child("si", 243, 60, t_si, "shift_invert"))
    print(json.dumps(results[-1]), flush=True)
    # Route 2: plain Lanczos SA, restart-capped.
    results.append(run_child("sa", 243, 50, t_sa, "plain_sa"))
    print(json.dumps(results[-1]), flush=True)
    with open(os.path.join(RESULTS, "arpack_northstar_g243.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
