from .dl_sig import create_dl_sig  # noqa: F401
from .channel import (awgn, apply_clock_offset, apply_freq_offset,  # noqa: F401
                      multipath_channel)
