from . import srgb, sampling, pbr, shadow, skybox  # noqa: F401
