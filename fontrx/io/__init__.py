"""Image containers and encoders.

Equivalent of the reference's ``src/tools/Image.zig`` + ``qoi.zig``:
Gray / Winding / RGB image types with a common RGB accessor, a
``GlyphDebug`` winding-map debug renderer, and a QOI encoder whose
output is byte-compatible with the reference's.
"""

from fontrx.io.image import Gray, Winding, RGB, GlyphDebug  # noqa: F401
from fontrx.io.qoi import encode_rgb, decode  # noqa: F401
