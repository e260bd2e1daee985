"""Scene layer: view transforms, text layout, page rendering, and the
interactive loop.

Semantics of the reference's application layer (``src/Appli.zig``:
glyph dedup cache, per-instance transforms, pen advance, zoom/pan view
transform; ``src/CallbackContext.zig``: event flags), re-designed so a
whole page is one batched raster step instead of per-instance draws.
"""

from fontrx.scene.transform import ViewTransform  # noqa: F401
from fontrx.scene.layout import TextLayout, layout_text  # noqa: F401
from fontrx.scene.page import PageRenderer  # noqa: F401
