from .domain import LagrangeSelectors, TwoAdicMultiplicativeCoset
from .fold import fold_matrix, fold_matrix_jit, fold_row_scalar
from .interpolate import interpolate_coset, interpolate_coset_host
from .ntt import (
    bit_reverse_rows,
    coset_lde_batch,
    coset_lde_batch_jit,
    intt,
    intt_jit,
    ntt,
    ntt_jit,
)
from .powers import np_geom_powers
from .reduce import fp_sum_axis0

__all__ = [
    "LagrangeSelectors",
    "TwoAdicMultiplicativeCoset",
    "fold_matrix",
    "fold_matrix_jit",
    "fold_row_scalar",
    "interpolate_coset",
    "interpolate_coset_host",
    "bit_reverse_rows",
    "coset_lde_batch",
    "coset_lde_batch_jit",
    "intt",
    "intt_jit",
    "ntt",
    "ntt_jit",
    "np_geom_powers",
    "fp_sum_axis0",
]
