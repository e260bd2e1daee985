"""fontrx — a TPU-native glyph rasterization framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
nyasyamorina/font-renderer (a Zig + Vulkan interactive font renderer):

- ``fontrx.font``     — host-side TrueType frontend (tables, cmap, glyf,
  compound flattening, contour normalization).  Reference behavior:
  ``src/font/{ttf,Font,Glyph,CharGlyphMapping}.zig``.
- ``fontrx.pack``     — glyph outlines -> padded quadratic-segment tensors
  (the TPU analog of the reference's GPU vertex/index buffers,
  ``src/Appli.zig:219-302``).
- ``fontrx.kernels``  — Pallas TPU kernels + jnp references: analytic
  winding fill (the math of ``src/tools/render_glyph.zig:35-73``), MSAA
  supersampled coverage, signed-distance fields, and a Loop-Blinn style
  triangle fill (the math of ``src/shaders/shader.slang:32-51``).
- ``fontrx.engine``   — jitted raster steps, atlas batching, multi-device
  sharding over a ``jax.sharding.Mesh``, compilation-cache wiring
  (TPU analog of ``src/VulkanContext.zig`` + ``src/CacheManager.zig``).
- ``fontrx.scene``    — text layout, view transforms, interactive loop
  (semantics of ``src/Appli.zig`` + ``src/CallbackContext.zig``).
- ``fontrx.io``       — image containers and a QOI encoder byte-compatible
  with ``src/tools/qoi.zig``.
- ``fontrx.geometry`` — host sweep-line triangulation compat mode
  (semantics of ``src/tools/{TriangulatedGlyph,geometry}.zig``).
- ``fontrx.cli``      — config/flag system + entry point
  (semantics of ``src/Config.zig`` + ``src/main.zig``).

Everything under jit is static-shape, fused, and batched; multi-chip
scaling is expressed with ``jax.sharding`` + ``shard_map`` so collectives
ride ICI.  This is a new architecture, not a port.
"""

__version__ = "0.1.0"

from fontrx.font.font import Font  # noqa: F401
from fontrx.font.stack import FontStack  # noqa: F401
from fontrx.pack.segments import pack_glyph, pack_glyphs  # noqa: F401
