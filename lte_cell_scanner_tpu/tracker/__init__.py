from .state import GlobalState, TrackedCell  # noqa: F401
from .runner import TrackerRunner  # noqa: F401
