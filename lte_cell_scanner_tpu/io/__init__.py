from .e4000 import compute_fc_programmed  # noqa: F401
from .capture import CaptureSource, FileSource, SimSource, capture_data  # noqa: F401
