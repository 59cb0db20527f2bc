"""Deterministic software canvas backing the Processing (P*) script tier.

The reference renders through processing.core.PGraphics (Java2D / OpenGL
— io.warp10.script.processing.*, registrations WarpScriptLib.java:
3187-3340). Antialiased platform rasterizers are not reproducible across
JREs, so this engine substitutes an exact coverage rasterizer: a pixel
is painted iff its CENTER satisfies the shape's geometry predicate, in
IEEE float64 — the same arithmetic an SQL engine can replay, which is
what makes the canvas queries oracle-able (and the output stable across
machines). That substitution is the one documented deviation; the stack
contracts (pop-until-canvas, push canvas back, result values on top) are
the reference's.
"""

from warp10_platform_spark.canvas.core import PCanvas, PImage  # noqa: F401
