from .config import Precision, complex_dtype, precision_mode, real_dtype, set_precision
from .debug import (check_imaginary_residue, check_partial_unitary,
                    check_rdm_sanity, nan_checks)
from .profiling import PhaseTimer, annotate, trace_to

__all__ = [
    "Precision", "complex_dtype", "precision_mode", "real_dtype",
    "set_precision",
    "check_imaginary_residue", "check_partial_unitary", "check_rdm_sanity",
    "nan_checks",
    "PhaseTimer", "annotate", "trace_to",
]
