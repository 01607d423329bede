from . import math3d, aabb, args, asset_path, config, hashing  # noqa: F401
