from .itfile import read_itfile, write_itfile  # noqa: F401
from .rtl import read_rtlsdr_file  # noqa: F401
