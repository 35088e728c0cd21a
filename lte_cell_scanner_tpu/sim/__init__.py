from .dl_sig import create_dl_sig  # noqa: F401
from .channel import (ClockResampler, awgn,  # noqa: F401
                      apply_clock_offset, apply_coupled_offset,
                      apply_freq_offset, multipath_channel)
