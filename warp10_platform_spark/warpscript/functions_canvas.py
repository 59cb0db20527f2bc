"""Processing (P*) script tier — ~100 registrations.

Reference: io.warp10.script.processing.* (registrations
WarpScriptLib.java:3187-3340). Stack contract mirrored exactly from
ProcessingUtil.parseParams: every P* function pops its arguments until
it meets the canvas (so the canvas can sit UNDER any number of args),
pushes the canvas back, then pushes any result value on top. Color and
pixel values cross the stack as SIGNED 32-bit longs, like the Java
`(long) int` widenings in Pcolor/Pget/Ppixels.

Rendering is the exact-coverage rasterizer in canvas/core.py (see the
deviation note there); Pencode emits the deterministic RGBA PNG writer's
data URL, Pdecode reads PNG (JPEG input raises — no JPEG codec, honest).
"""

from __future__ import annotations

import base64 as _b64
import math
import re as _re

import numpy as np

from warp10_platform_spark.canvas.core import PCanvas, PImage, decode_png_image
from warp10_platform_spark.warpscript.functions import REGISTRY, register

_MAX_PIXELS = 16_000_000  # PIXEL_LIMIT stand-in (stack ATTRIBUTE_MAX_PIXELS)


def _i32(v: int) -> int:
    """unsigned 32-bit → Java signed int semantics (Pcolor pushes
    `(long) int`)."""
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v & 0x80000000 else v


def _u32(v) -> int:
    return int(v) & 0xFFFFFFFF


def _parse_params(st, *arities):
    """Pop until the PCanvas (ProcessingUtil.parseParams): returns
    [canvas, arg1, ...] in call order."""
    params = []
    count = 0
    mx = max(arities)
    while st.depth() > 0 and count <= mx:
        top = st.pop()
        if isinstance(top, PCanvas):
            params.append(top)
            params.reverse()
            break
        params.append(top)
        count += 1
    else:
        raise ValueError("no PGraphics instance found on the stack")
    if count not in arities:
        raise ValueError(f"invalid parameter count {count}, expected one of {arities}")
    return params


def _f(v) -> float:
    # Java float math: the reference narrows every numeric to float32
    return float(np.float32(v))


def _pg_fn(name, arities, fn, result=False):
    """Register a canvas method: fn(pg, *args) — canvas pushed back,
    optional result on top."""

    def run(st):
        params = _parse_params(st, *arities)
        pg = params[0]
        out = fn(pg, *params[1:])
        st.push(pg)
        if result:
            st.push(out)

    REGISTRY[name] = run
    return run


# ----------------------------------------------------------- rendering

@register("PGraphics")
def _pgraphics(st):
    """width height '2D'|'3D' PGraphics (rendering/PGraphics.java):
    push a fresh canvas. 3D renders through the default perspective
    camera with a software z-buffer (the reference's P3D is OpenGL)."""
    kind = str(st.pop())
    if not (kind.startswith("2D") or kind.startswith("3D")):
        raise ValueError("PGraphics expects a type ('2D' or '3D')")
    height = int(st.pop())
    width = int(st.pop())
    if width * height > _MAX_PIXELS:
        raise ValueError(f"PGraphics limited to {_MAX_PIXELS} pixels")
    st.push(PCanvas(width, height, kind[:2]))


@register("Pencode")
def _pencode(st):
    """[chunks] image Pencode (processing/Pencode.java): base64 data
    URL; chunks map supports format=png + tEXt/zTXt/iTXt entries
    ({'keyword','text',...} maps, as the reference)."""
    top = st.pop()
    chunks = None
    if isinstance(top, dict):
        chunks = top
        top = st.pop()
    if not isinstance(top, PImage):
        raise TypeError("Pencode operates on a PGRAPHICS or PIMAGE instance")
    fmt = str((chunks or {}).get("format", "png")).lower()
    if fmt in ("jpeg", "jpg"):
        import numpy as _np

        from warp10_platform_spark.multimodal.jpeg import encode_jpeg_color

        argb = top.pix.astype(_np.uint32)
        rgb = _np.stack([(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF],
                        axis=-1).astype(_np.uint8)
        jpg = encode_jpeg_color(rgb)
        st.push("data:image/jpeg;base64," + _b64.b64encode(jpg).decode("ascii"))
        return
    if fmt != "png":
        raise NotImplementedError("Pencode: formats are 'png' and 'jpeg'")
    png = top.encode_png(_norm_chunks(chunks))
    st.push("data:image/png;base64," + _b64.b64encode(png).decode("ascii"))


def _norm_chunks(chunks):
    if not chunks:
        return None
    out = {}
    for kind in ("tEXt", "zTXt", "iTXt"):
        if kind in chunks:
            entries = chunks[kind]
            if not isinstance(entries, list):
                raise ValueError("chunk type must be associated with a list of chunks")
            out[kind] = entries
    return out or None


@register("Pdecode")
def _pdecode(st):
    """data-URI string | bytes Pdecode (image/Pdecode.java) → PImage.
    PNG via the deterministic decoder; JPEG via the own baseline codec
    (multimodal/jpeg.py)."""
    top = st.pop()
    if isinstance(top, str) and top.startswith("data:image/"):
        data = _b64.b64decode(top[top.index(",") + 1 :])
    elif isinstance(top, (bytes, bytearray)):
        data = bytes(top)
    else:
        raise TypeError("Pdecode expects a base64 data URI or a byte array")
    if data[:2] == b"\xff\xd8":
        from warp10_platform_spark.multimodal.jpeg import decode_jpeg

        arr = decode_jpeg(data)
        if arr.ndim == 2:
            g = arr.astype(np.uint32)
            pix = (np.uint32(0xFF) << 24) | (g << 16) | (g << 8) | g
        else:
            pix = (
                (np.uint32(0xFF) << 24)
                | (arr[:, :, 0].astype(np.uint32) << 16)
                | (arr[:, :, 1].astype(np.uint32) << 8)
                | arr[:, :, 2].astype(np.uint32)
            )
        st.push(PImage(pix.shape[1], pix.shape[0], pix))
        return
    st.push(decode_png_image(data))


_pg_fn("PblendMode", (1,), lambda pg, m: setattr(pg.style, "blend_mode", str(m)))
_pg_fn("Pclip", (4,), lambda pg, a, b, c, d: pg.clip(_f(a), _f(b), _f(c), _f(d)))
_pg_fn("PnoClip", (0,), lambda pg: pg.no_clip())


# --------------------------------------------------------------- color

def _do_background(pg, *args):
    if len(args) == 1 and isinstance(args[0], PImage):
        pg.background(args[0])
    else:
        pg.background(*[a if isinstance(a, int) else _f(a) for a in args])


_pg_fn("Pbackground", (1, 2, 3, 4), _do_background)
_pg_fn("Pclear", (0,), lambda pg: pg.clear())
_pg_fn("Pcolor", (1, 2, 3, 4),
       lambda pg, *a: _i32(pg.color(*[x if isinstance(x, int) else _f(x) for x in a])),
       result=True)


def _set_color_mode(pg, *args):
    mode = str(args[0]).upper()
    if mode not in ("RGB", "HSB"):
        raise ValueError("colorMode expects 'RGB' or 'HSB'")
    pg.style.color_mode = mode
    if len(args) == 2:
        m = _f(args[1])
        pg.style.color_max = [m, m, m, m]
    elif len(args) == 4:
        m1, m2, m3 = map(_f, args[1:])
        pg.style.color_max = [m1, m2, m3, pg.style.color_max[3]]
    elif len(args) == 5:
        pg.style.color_max = list(map(_f, args[1:]))


_pg_fn("PcolorMode", (1, 2, 4, 5), _set_color_mode)

for _name, _which in (("Palpha", "alpha"), ("Pred", "red"), ("Pgreen", "green"),
                      ("Pblue", "blue"), ("Phue", "hue"),
                      ("Psaturation", "saturation"), ("Pbrightness", "brightness")):
    _pg_fn(_name, (1,),
           (lambda w: lambda pg, c: float(pg.channel(_u32(c), w)))(_which),
           result=True)

_pg_fn("PlerpColor", (3,),
       lambda pg, c1, c2, t: _i32(pg.lerp_color(_u32(c1), _u32(c2), _f(t))),
       result=True)


def _col_args(pg, args):
    return pg.color(*[a if isinstance(a, int) else _f(a) for a in args])


def _do_fill(pg, *args):
    pg.style.fill_on = True
    pg.style.fill_color = _col_args(pg, args)


def _do_stroke(pg, *args):
    pg.style.stroke_on = True
    pg.style.stroke_color = _col_args(pg, args)


_pg_fn("Pfill", (1, 2, 3, 4), _do_fill)
_pg_fn("Pstroke", (1, 2, 3, 4), _do_stroke)
_pg_fn("PnoFill", (0,), lambda pg: setattr(pg.style, "fill_on", False))
_pg_fn("PnoStroke", (0,), lambda pg: setattr(pg.style, "stroke_on", False))


def _do_tint(pg, *args):
    pg.style.tint_on = True
    pg.style.tint_color = _col_args(pg, args)


_pg_fn("Ptint", (1, 2, 3, 4), _do_tint)
_pg_fn("PnoTint", (0,), lambda pg: setattr(pg.style, "tint_on", False))


# ---------------------------------------------------------------- math

_pg_fn("Pconstrain", (3,),
       lambda pg, v, lo, hi: float(min(max(_f(v), _f(lo)), _f(hi))), result=True)
_pg_fn("Plerp", (3,),
       lambda pg, a, b, t: float(np.float32(_f(a) + (_f(b) - _f(a)) * _f(t))),
       result=True)
_pg_fn("Pnorm", (3,),
       lambda pg, v, a, b: float(np.float32((_f(v) - _f(a)) / (_f(b) - _f(a)))),
       result=True)
_pg_fn("Pmap", (5,),
       lambda pg, v, a1, b1, a2, b2: float(np.float32(
           _f(a2) + (_f(b2) - _f(a2)) * ((_f(v) - _f(a1)) / (_f(b1) - _f(a1))))),
       result=True)


def _dist(pg, *args):
    if len(args) == 4:
        dx, dy = _f(args[2]) - _f(args[0]), _f(args[3]) - _f(args[1])
        return float(np.float32(math.sqrt(dx * dx + dy * dy)))
    x1, y1, z1, x2, y2, z2 = map(_f, args)
    return float(np.float32(math.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2 + (z2 - z1) ** 2)))


_pg_fn("Pdist", (4, 6), _dist, result=True)
_pg_fn("Pmag", (2, 3),
       lambda pg, *a: float(np.float32(math.sqrt(sum(_f(v) ** 2 for v in a)))),
       result=True)


# -------------------------------------------------------------- shapes

_pg_fn("Ppoint", (2, 3), lambda pg, *a: pg.point(*map(_f, a)))
_pg_fn("Pline", (4, 6), lambda pg, *a: pg.line(*map(_f, a)))
_pg_fn("Prect", (4, 5, 8), lambda pg, *a: pg.rect(*map(_f, a)))
_pg_fn("Pquad", (8,), lambda pg, *a: pg.quad(*map(_f, a)))
_pg_fn("Ptriangle", (6,), lambda pg, *a: pg.triangle(*map(_f, a)))
_pg_fn("Pellipse", (4,), lambda pg, *a: pg.ellipse(*map(_f, a)))


def _do_arc(pg, *args):
    nums = list(map(_f, args[:6]))
    mode = str(args[6]) if len(args) == 7 else "OPEN"
    pg.arc(*nums, mode=mode)


_pg_fn("Parc", (6, 7), _do_arc)

for _name, _attr in (("PrectMode", "rect_mode"), ("PellipseMode", "ellipse_mode"),
                     ("PimageMode", "image_mode"), ("PshapeMode", "shape_mode")):
    _pg_fn(_name, (1,),
           (lambda at: lambda pg, m: setattr(pg.style, at, str(m).upper()))(_attr))

_pg_fn("PstrokeWeight", (1,),
       lambda pg, w: setattr(pg.style, "stroke_weight", _f(w)))
_pg_fn("PstrokeCap", (1,),
       lambda pg, m: setattr(pg.style, "stroke_cap", str(m).upper()))
# joins render ROUND under the coverage rule regardless of the mode —
# the disc at each shared vertex IS the join; the setting is tracked for
# pushStyle/popStyle fidelity (documented deviation from MITER/BEVEL)
_pg_fn("PstrokeJoin", (1,),
       lambda pg, m: setattr(pg.style, "stroke_join", str(m).upper()))

_pg_fn("PbeginShape", (0, 1),
       lambda pg, *a: pg.begin_shape(str(a[0]).upper() if a else "POLYGON"))
_pg_fn("PendShape", (0, 1),
       lambda pg, *a: pg.end_shape(bool(a) and str(a[0]).upper() == "CLOSE"))
_pg_fn("PbeginContour", (0,), lambda pg: pg.begin_contour())
_pg_fn("PendContour", (0,), lambda pg: pg.end_contour())
_pg_fn("Pvertex", (2, 3), lambda pg, *a: pg.vertex(*map(_f, a)))
_pg_fn("PcurveVertex", (2,), lambda pg, x, y: pg.curve_vertex(_f(x), _f(y)))
_pg_fn("PbezierVertex", (6,), lambda pg, *a: pg.bezier_vertex(*map(_f, a)))
_pg_fn("PquadraticVertex", (4,), lambda pg, *a: pg.quadratic_vertex(*map(_f, a)))

_pg_fn("Pbezier", (8,), lambda pg, *a: pg.bezier(*map(_f, a)))
_pg_fn("Pcurve", (8,), lambda pg, *a: pg.curve(*map(_f, a)))
_pg_fn("PbezierDetail", (1,),
       lambda pg, n: setattr(pg.style, "bezier_detail", max(1, int(n))))
_pg_fn("PcurveDetail", (1,),
       lambda pg, n: setattr(pg.style, "curve_detail", max(1, int(n))))
_pg_fn("PcurveTightness", (1,),
       lambda pg, t: setattr(pg.style, "curve_tightness", _f(t)))
_pg_fn("PbezierPoint", (5,),
       lambda pg, *a: float(np.float32(pg.bezier_point(*map(_f, a)))), result=True)
_pg_fn("PbezierTangent", (5,),
       lambda pg, *a: float(np.float32(pg.bezier_tangent(*map(_f, a)))), result=True)
_pg_fn("PcurvePoint", (5,),
       lambda pg, *a: float(np.float32(pg.curve_point(*map(_f, a)))), result=True)
_pg_fn("PcurveTangent", (5,),
       lambda pg, *a: float(np.float32(pg.curve_tangent(*map(_f, a)))), result=True)

_pg_fn("Pbox", (1, 3), lambda pg, *a: pg.box(*map(_f, a)))
_pg_fn("Psphere", (1,), lambda pg, r: pg.sphere(_f(r)))
_pg_fn("PsphereDetail", (1, 2),
       lambda pg, *a: setattr(pg.style, "sphere_detail", int(a[0])))


# ----------------------------------------------------------- transform

_pg_fn("Ptranslate", (2, 3), lambda pg, *a: pg.translate(*map(_f, a)))
_pg_fn("Protate", (1,), lambda pg, a: pg.rotate(_f(a)))
_pg_fn("ProtateX", (1,), lambda pg, a: pg.rotate_x(_f(a)))
_pg_fn("ProtateY", (1,), lambda pg, a: pg.rotate_y(_f(a)))
_pg_fn("ProtateZ", (1,), lambda pg, a: pg.rotate_z(_f(a)))
_pg_fn("Pscale", (1, 2, 3), lambda pg, *a: pg.scale(*map(_f, a)))
_pg_fn("PshearX", (1,), lambda pg, a: pg.shear_x(_f(a)))
_pg_fn("PshearY", (1,), lambda pg, a: pg.shear_y(_f(a)))
_pg_fn("PpushMatrix", (0,), lambda pg: pg.push_matrix())
_pg_fn("PpopMatrix", (0,), lambda pg: pg.pop_matrix())
_pg_fn("PresetMatrix", (0,), lambda pg: pg.reset_matrix())
_pg_fn("PpushStyle", (0,), lambda pg: pg.push_style())
_pg_fn("PpopStyle", (0,), lambda pg: pg.pop_style())


# ---------------------------------------------------------------- image

@register("Psize")
def _psize(st):
    """image Psize (image/Psize.java): consume the image, push w, h."""
    top = st.pop()
    if not isinstance(top, PImage):
        raise TypeError("Psize expects a PIMAGE or PGRAPHICS instance")
    st.push(top.width)
    st.push(top.height)


@register("Ppixels")
def _ppixels(st):
    """canvas|image Ppixels (image/Ppixels.java): pixels as signed longs;
    a bare PImage is consumed, a canvas is pushed back under the list."""
    top = st.peek()
    if isinstance(top, PCanvas):
        pg = st.pop()
        st.push(pg)
        st.push([_i32(v) for v in pg.pixels()])
    elif isinstance(top, PImage):
        img = st.pop()
        st.push([_i32(v) for v in img.pixels()])
    else:
        raise TypeError("Ppixels can only be applied to PGraphics or PImage")


@register("PupdatePixels")
def _pupdatepixels(st):
    """pixels-list PupdatePixels over a canvas (parseParams form) or a
    bare PImage directly under the list (image/PupdatePixels.java)."""
    if (st.depth() >= 2 and isinstance(st.stack[-2], PImage)
            and not isinstance(st.stack[-2], PCanvas) and isinstance(st.peek(), list)):
        values = st.pop()
        img = st.peek()
        img.set_pixels(values)
        return
    params = _parse_params(st, 1)
    pg, values = params
    if not isinstance(values, list):
        raise TypeError("PupdatePixels expects an array of pixels on top of the stack")
    pg.set_pixels(values)
    st.push(pg)


@register("Pget")
def _pget(st):
    """Pget (image/Pget.java): () → copy; (x,y) → signed color long;
    (x,y,w,h) → sub-image. Canvas pushed back UNDER the result."""
    params = _parse_params(st, 0, 2, 4)
    pg = params[0]
    if len(params) == 1:
        out = pg.get()
    elif len(params) == 3:
        out = _i32(pg.get(int(params[1]), int(params[2])))
    else:
        out = pg.get(*[int(p) for p in params[1:]])
    st.push(pg)
    st.push(out)


def _do_set(pg, x, y, v):
    pg.set(int(x), int(y), v if isinstance(v, PImage) else _u32(v))


_pg_fn("Pset", (3,), _do_set)


@register("Pcopy")
def _pcopy(st):
    """Pcopy (image/Pcopy.java): () → duplicate canvas as image;
    (sx,sy,sw,sh,dx,dy,dw,dh) self-copy; (img, 8 ints) cross-copy."""
    params = _parse_params(st, 0, 8, 9)
    pg = params[0]
    if len(params) == 1:
        st.push(pg)
        st.push(pg.to_image())
        return
    if len(params) == 9:
        src, nums = pg, [int(p) for p in params[1:]]
    else:
        src, nums = params[1], [int(p) for p in params[2:]]
        if not isinstance(src, PImage):
            raise TypeError("Pcopy source must be a PIMAGE")
    pg.copy_region(src, *nums)
    st.push(pg)


@register("Pblend")
def _pblend(st):
    """Pblend (image/Pblend.java): (8 ints, mode) self-blend or
    (img, 8 ints, mode)."""
    params = _parse_params(st, 9, 10)
    pg = params[0]
    mode = str(params[-1])
    if len(params) == 10:
        src, nums = pg, [int(p) for p in params[1:-1]]
    else:
        src, nums = params[1], [int(p) for p in params[2:-1]]
        if not isinstance(src, PImage):
            raise TypeError("Pblend source must be a PIMAGE")
    pg.blend_region(src, *nums, mode=mode)
    st.push(pg)


def _do_filter(pg, *args):
    if len(args) == 1:
        pg.filter(str(args[0]))
    else:
        pg.filter(str(args[0]), _f(args[1]))


_pg_fn("Pfilter", (1, 2), _do_filter)


@register("Presize")
def _presize(st):
    """w h Presize over a canvas or a bare PImage (image/Presize.java)."""
    if (st.depth() >= 3 and isinstance(st.stack[-3], PImage)
            and not isinstance(st.stack[-3], PCanvas)):
        h = int(st.pop())
        w = int(st.pop())
        st.peek().resize(w, h)
        return
    params = _parse_params(st, 2)
    pg = params[0]
    pg.resize(int(params[1]), int(params[2]))
    st.push(pg)


def _do_mask(pg, source):
    pg.mask(source)


_pg_fn("Pmask", (1,), _do_mask)


def _do_image(pg, img, *nums):
    if not isinstance(img, PImage):
        raise TypeError("Pimage expects a PIMAGE")
    pg.draw_image(img, *map(_f, nums))


_pg_fn("Pimage", (3, 5), lambda pg, *a: _do_image(pg, a[0], *a[1:]))
_pg_fn("PtoImage", (0,), lambda pg: pg.to_image(), result=True)


# ----------------------------------------------------------- typography

@register("PcreateFont")
def _pcreatefont(st):
    """name size [smooth] PcreateFont (typography/PcreateFont.java):
    the single built-in 5x7 bitmap font at the requested size (no font
    files resolve here — deviation documented in canvas/font5x7.py)."""
    args = []
    while st.depth() and len(args) < 3 and not isinstance(st.peek(), PCanvas):
        args.append(st.pop())
        if isinstance(args[-1], str):
            break
    args.reverse()
    name = str(args[0]) if args else "builtin5x7"
    size = float(args[1]) if len(args) > 1 else 12.0
    st.push({"font": "builtin5x7", "name": name, "size": size})


def _do_textfont(pg, font, *rest):
    if not isinstance(font, dict) or "size" not in font:
        raise TypeError("PtextFont expects a font created by PcreateFont")
    size = _f(rest[0]) if rest else float(font["size"])
    pg.style.text_size = size
    pg.style.text_leading = size * 1.275


_pg_fn("PtextFont", (1, 2), _do_textfont)


def _do_text(pg, *args):
    # (value, x, y) | (value, x, y, z) | (str, x1, y1, x2, y2) text box
    s = args[0] if isinstance(args[0], str) else (
        str(args[0]) if not isinstance(args[0], float) else repr(args[0])
    )
    if len(args) in (3, 4):
        pg.text(s, _f(args[1]), _f(args[2]))
    else:  # text box: draw at its top-left with wrap width ignored
        pg.text(s, _f(args[1]), _f(args[2]) + pg.text_ascent())


_pg_fn("Ptext", (3, 4, 5), _do_text)


def _do_textalign(pg, *args):
    pg.style.text_align = str(args[0]).upper()
    if len(args) == 2:
        pg.style.text_align_y = str(args[1]).upper()


_pg_fn("PtextAlign", (1, 2), _do_textalign)


def _do_textsize(pg, s):
    pg.style.text_size = _f(s)
    pg.style.text_leading = _f(s) * 1.275


_pg_fn("PtextSize", (1,), _do_textsize)
_pg_fn("PtextLeading", (1,),
       lambda pg, v: setattr(pg.style, "text_leading", _f(v)))
_pg_fn("PtextMode", (1,), lambda pg, m: None)  # MODEL/SHAPE: no-op raster
_pg_fn("PtextAscent", (0,), lambda pg: float(pg.text_ascent()), result=True)
_pg_fn("PtextDescent", (0,), lambda pg: float(pg.text_descent()), result=True)
_pg_fn("PtextWidth", (1,), lambda pg, s: float(pg.text_width(str(s))), result=True)


# ------------------------------------------------------------ SVG shape

class SVGShape:
    """Minimal SVG geometry holder for PloadShape/Pshape (the reference
    parses full SVG through PShapeJava2D; this covers rect/circle/
    ellipse/line/polyline/polygon and M/L/H/V/Z paths — enough for the
    generated chart SVGs the function is typically fed)."""

    def __init__(self, elements, width: float, height: float):
        self.elements = elements  # list of ('fill'|'stroke', ring pts)
        self.width = width
        self.height = height


_PATH_TOK = _re.compile(r"([MLHVZmlhvz])|(-?\d*\.?\d+(?:[eE][-+]?\d+)?)")


def parse_svg(text: str) -> SVGShape:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    w = float(_re.sub(r"[a-z%]+$", "", root.get("width", "100") or "100"))
    h = float(_re.sub(r"[a-z%]+$", "", root.get("height", "100") or "100"))
    elements = []

    def walk(el):
        tag = el.tag.rsplit("}", 1)[-1]
        closed_ring = None
        open_line = None
        if tag == "rect":
            x, y = float(el.get("x", 0)), float(el.get("y", 0))
            rw, rh = float(el.get("width", 0)), float(el.get("height", 0))
            closed_ring = [(x, y), (x + rw, y), (x + rw, y + rh), (x, y + rh)]
        elif tag in ("circle", "ellipse"):
            cx, cy = float(el.get("cx", 0)), float(el.get("cy", 0))
            if tag == "circle":
                rx = ry = float(el.get("r", 0))
            else:
                rx, ry = float(el.get("rx", 0)), float(el.get("ry", 0))
            closed_ring = [
                (cx + rx * math.cos(2 * math.pi * i / 48),
                 cy + ry * math.sin(2 * math.pi * i / 48))
                for i in range(48)
            ]
        elif tag == "line":
            open_line = [(float(el.get("x1", 0)), float(el.get("y1", 0))),
                         (float(el.get("x2", 0)), float(el.get("y2", 0)))]
        elif tag in ("polyline", "polygon"):
            nums = [float(v) for v in _re.findall(r"-?\d*\.?\d+(?:[eE][-+]?\d+)?",
                                                  el.get("points", ""))]
            pts = list(zip(nums[0::2], nums[1::2]))
            if tag == "polygon":
                closed_ring = pts
            else:
                open_line = pts
        elif tag == "path":
            pts, start, cur = [], None, (0.0, 0.0)
            closed = False
            toks = _PATH_TOK.findall(el.get("d", ""))
            i, cmd = 0, None
            while i < len(toks):
                c, num = toks[i]
                if c:
                    cmd = c
                    if cmd in "Zz":
                        closed = True
                    i += 1
                    continue
                v1 = float(num)
                if cmd in "HhVv":
                    if cmd == "H":
                        cur = (v1, cur[1])
                    elif cmd == "h":
                        cur = (cur[0] + v1, cur[1])
                    elif cmd == "V":
                        cur = (cur[0], v1)
                    else:
                        cur = (cur[0], cur[1] + v1)
                    pts.append(cur)
                    i += 1
                    continue
                v2 = float(toks[i + 1][1])
                if cmd in "Mm":
                    cur = (v1, v2) if cmd == "M" else (cur[0] + v1, cur[1] + v2)
                    start = cur
                    pts.append(cur)
                    cmd = "L" if cmd == "M" else "l"
                else:  # L / l
                    cur = (v1, v2) if cmd == "L" else (cur[0] + v1, cur[1] + v2)
                    pts.append(cur)
                i += 2
            del start
            if closed:
                closed_ring = pts
            elif len(pts) >= 2:
                open_line = pts
        if closed_ring is not None:
            elements.append(("ring", closed_ring, el.get("fill"), el.get("stroke")))
        if open_line is not None:
            elements.append(("line", open_line, None, el.get("stroke")))
        for child in el:
            walk(child)

    walk(root)
    return SVGShape(elements, w, h)


@register("PloadShape")
def _ploadshape(st):
    """svg-string PloadShape (shape/PloadShape.java)."""
    st.push(parse_svg(str(st.pop())))


def _css_color(spec):
    if not spec or spec in ("none", "transparent"):
        return None
    s = spec.strip()
    if s.startswith("#"):
        s = s[1:]
        if len(s) == 3:
            s = "".join(ch * 2 for ch in s)
        return 0xFF000000 | int(s, 16)
    named = {"black": 0xFF000000, "white": 0xFFFFFFFF, "red": 0xFFFF0000,
             "green": 0xFF008000, "blue": 0xFF0000FF, "gray": 0xFF808080}
    return named.get(s.lower())


def _do_shape(pg, shape, *nums):
    if not isinstance(shape, SVGShape):
        raise TypeError("Pshape expects a shape loaded by PloadShape")
    nums = list(map(_f, nums))
    ox, oy, sx, sy = 0.0, 0.0, 1.0, 1.0
    if len(nums) >= 2:
        ox, oy = nums[0], nums[1]
    if len(nums) == 4:
        sx = nums[2] / shape.width if shape.width else 1.0
        sy = nums[3] / shape.height if shape.height else 1.0
        if pg.style.shape_mode == "CENTER":
            ox, oy = ox - nums[2] / 2.0, oy - nums[3] / 2.0
    elif pg.style.shape_mode == "CENTER" and len(nums) >= 2:
        ox, oy = ox - shape.width / 2.0, oy - shape.height / 2.0
    st = pg.style
    for kind, pts, fill_spec, stroke_spec in shape.elements:
        dev = pg._xf([(ox + x * sx, oy + y * sy, 0.0) for x, y in pts])
        if kind == "ring":
            fill_col = _css_color(fill_spec)
            if fill_col is None and fill_spec is None and st.fill_on:
                fill_col = st.fill_color
            if fill_col is not None:
                pg._fill_rings_device([dev], fill_col)
            stroke_col = _css_color(stroke_spec)
            if stroke_col is None and stroke_spec is None and st.stroke_on:
                stroke_col = st.stroke_color
            if stroke_col is not None:
                pg._stroke_polyline_device(dev, stroke_col, closed=True)
        else:
            stroke_col = _css_color(stroke_spec)
            if stroke_col is None and st.stroke_on:
                stroke_col = st.stroke_color
            if stroke_col is not None:
                pg._stroke_polyline_device(dev, stroke_col, closed=False)


_pg_fn("Pshape", (1, 3, 5), _do_shape)
