"""Host-side TrueType font frontend.

Parses ``.ttf`` binaries into normalized quadratic-Bezier outlines ready
for segment packing.  Behavioral equivalent of the reference's
``src/font/{ttf,Font,Glyph,CharGlyphMapping}.zig`` re-designed around
NumPy vectorized decoding (flag/coordinate streams decode as arrays, not
byte-at-a-time loops).
"""

from fontrx.font.font import Font, FontInfo  # noqa: F401
from fontrx.font.glyph import Glyph, Contour  # noqa: F401
from fontrx.font.charmap import CharGlyphMapping, RangeMapping  # noqa: F401
