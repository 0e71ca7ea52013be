from spectra_tpu.matop.dense import (
    DenseSymMatProd,
    DenseGenMatProd,
    DenseHermMatProd,
)
from spectra_tpu.matop.arnoldi_op import ArnoldiOp, IdentityBOp

__all__ = [
    "DenseSymMatProd",
    "DenseGenMatProd",
    "DenseHermMatProd",
    "ArnoldiOp",
    "IdentityBOp",
]
