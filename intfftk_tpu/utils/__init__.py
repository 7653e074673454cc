"""Utilities: reference-format stimulus IO, profiling, roofline accounting."""

from .dat_io import read_dat, write_dat
from .lanes import (bitrev_pair, bitrev_pair_indices, halves_to_interleave2,
                    interleave2_to_halves, merge_halves, split_halves)
from .roofline import KernelCost, fft_cost, roofline_fraction, TPU_SPECS

__all__ = ["read_dat", "write_dat", "KernelCost", "fft_cost",
           "roofline_fraction", "TPU_SPECS", "bitrev_pair",
           "bitrev_pair_indices", "halves_to_interleave2",
           "interleave2_to_halves", "merge_halves", "split_halves"]
