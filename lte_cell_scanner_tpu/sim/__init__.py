from .dl_sig import create_dl_sig  # noqa: F401
from .channel import awgn, apply_freq_offset  # noqa: F401
