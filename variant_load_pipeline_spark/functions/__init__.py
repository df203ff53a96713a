from . import scalar, text, translate, zygosity  # noqa: F401
