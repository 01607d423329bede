from . import camera, lights, materials, mesh, scene_tree, textures  # noqa: F401
