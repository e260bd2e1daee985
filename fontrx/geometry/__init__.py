"""Host geometry engine: glyph triangulation into curve + interior
triangles.

The compatibility mode mirroring the reference's L4 geometry engine
(``src/tools/TriangulatedGlyph.zig`` + ``src/tools/geometry.zig``):
quadratic curves classify into *concave* / *convex* / *line*, curve
triangles carry the implicit-quadratic texcoords, and the glyph interior
is triangulated into solid triangles.

Algorithm note: the interior triangulation here is **ear clipping with
hole bridging** — a deliberately different, simpler algorithm than the
reference's left-to-right sweep line (``geometry.zig:150-203``), chosen
because the reference's sweep has a known failure mode on
self-intersecting contours (its ``preProcessContour`` fix is disabled;
``TriangulatedGlyph.zig:120``).  Output contract (triangle classes,
texcoords, ordering ``[concave][convex][solid]``) matches the reference.
"""

from fontrx.geometry.triangulated_glyph import TriangulatedGlyph  # noqa: F401
from fontrx.geometry.triangulate import triangulate_polygon  # noqa: F401
