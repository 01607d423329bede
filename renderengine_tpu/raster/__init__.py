from . import setup, reference_raster  # noqa: F401
