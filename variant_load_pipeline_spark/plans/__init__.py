from . import convert, load, postprocess  # noqa: F401
