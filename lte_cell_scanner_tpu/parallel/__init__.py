from .sharded import make_mesh, sharded_xcorr  # noqa: F401
