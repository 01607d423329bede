"""renderengine_tpu — a TPU-native real-time rendering framework.

A from-scratch rebuild of the capabilities of hugbed/RenderEngine (a C++23
Vulkan 1.3 forward renderer) designed TPU-first:

- The Vulkan command-buffer / pipeline layer (reference ``Source/VkRHI/``)
  becomes a single jitted JAX render-graph function per frame, compiled per
  (height, width, pass-config).
- GLSL vertex/fragment stages (reference ``Assets/Shaders/``) become dense
  array programs: MVP vertex transform as batched matmuls, tile-binned
  triangle rasterization with early-Z as per-tile MXU matmuls + argmin
  reductions, and Filament-style PBR shading as fused elementwise ops over
  the framebuffer.
- The bindless descriptor system (reference ``Source/Runtime/Renderer/
  Bindless.{h,cpp}``) becomes an HBM-resident texture/material atlas with
  integer handles and device gathers.
- Directional shadow mapping (reference ``Source/Runtime/Renderer/
  ShadowSystem.{h,cpp}``) becomes a depth-only raster pass feeding PCF
  lookups in the shading kernel.

Subpackages
-----------
core     math (glm/Vulkan-convention mat4 stack), AABB, args, asset paths,
         config, hashing.
scene    host-side scene state: meshes, scene tree, lights, materials,
         textures/atlas, cameras, loaders.
raster   the rasterizer: vertex transform, triangle setup, tile binning,
         the tile raster kernels (jnp reference + Pallas), depth-only mode.
shading  sRGB, PBR (Filament BRDF), Blinn-Phong, texture sampling, shadows
         (PCF), skybox, grid, tonemap/debug views.
graph    the frame graph: pass composition, jit cache, render loop,
         presentation.
parallel multi-chip sharding (mesh construction, image-space and
         geometry-space sharded rendering).
apps     MainSample-equivalent viewer and Editor stub.
utils    PNG IO, profiling.
"""

__version__ = "0.1.0"
