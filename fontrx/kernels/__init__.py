"""Raster kernels: jnp references + Pallas TPU implementations.

- ``grid``          — raster-grid geometry shared by every backend (the
  exact pixel->em-space mapping of ``src/tools/render_glyph.zig:13-27``).
- ``oracle``        — NumPy float winding oracle, operation-for-operation
  with ``src/tools/render_glyph.zig:35-73`` (the bit-exactness anchor).
- ``winding_jnp``   — vectorized ``jax.numpy`` winding fill (XLA
  reference used for interpret-mode testing of the Pallas kernel).
- ``winding_pallas``— the production Pallas TPU kernel.
- ``coverage``      — k x k in-register supersampled coverage (the MSAA
  analog of ``src/VulkanContext.zig:303-371``).
- ``sdf``           — signed-distance-field output mode.
- ``loopblinn``     — triangulation-equivalent fill: point-in-triangle +
  implicit-quadratic sign test (math of ``src/shaders/shader.slang:32-51``).
"""

from fontrx.kernels.grid import RasterGrid  # noqa: F401
