from spectra_tpu.linalg.givens import givens_rotation
from spectra_tpu.linalg.tridiag import (
    tridiag_qr,
    tridiag_qtq,
    accumulate_q,
    apply_yq,
    tridiag_eigen,
)

__all__ = [
    "givens_rotation",
    "tridiag_qr",
    "tridiag_qtq",
    "accumulate_q",
    "apply_yq",
    "tridiag_eigen",
]
