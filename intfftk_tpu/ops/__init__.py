"""Device compute path: XLA staged transform + Pallas kernels."""

from .intmath import CmultPlan, cmult_exact, neg_guarded, round_half_up, \
    wrap_width
from .pallas_fft import LargeFFTPlan, PallasFFTPlan
from .transform import FFTPlan, fft, fft_ifft_pair, ifft

__all__ = ["CmultPlan", "cmult_exact", "neg_guarded", "round_half_up",
           "wrap_width", "FFTPlan", "fft", "fft_ifft_pair", "ifft",
           "LargeFFTPlan", "PallasFFTPlan"]
