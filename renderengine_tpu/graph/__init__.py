from . import frame  # noqa: F401
