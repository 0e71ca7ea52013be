from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.selection import SortRule
from spectra_tpu.util.geigsmode import GEigsMode

__all__ = ["CompInfo", "SortRule", "GEigsMode"]
