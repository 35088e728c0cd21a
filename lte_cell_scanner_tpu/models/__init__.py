from .pn import lte_pn  # noqa: F401
from .pss import pss_fd, pss_td, PSS_FD, PSS_TD  # noqa: F401
from .sss import sss_fd, SSS_FD  # noqa: F401
from .rs import RsDl  # noqa: F401
