from . import events  # noqa: F401
from . import variants  # noqa: F401
