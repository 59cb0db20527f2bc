"""Exact-coverage software rasterizer: the engine behind the P* tier.

Substitutes processing.core.PGraphics (Java2D — see canvas/__init__.py
for the deviation note). Pixel model matches Processing: 32-bit ARGB
ints, row-major pixels[]. A pixel is painted iff its CENTER
(col + 0.5, row + 0.5) satisfies the shape predicate in float64 — the
same arithmetic SQL replays, making canvas geometry oracle-able.

Reference contracts mirrored (io.warp10.script.processing.*):
  color model  — PApplet.color/red/green/.../lerpColor with colorMode
                 RGB|HSB range scaling
  modes        — rectMode/ellipseMode/imageMode CORNER|CORNERS|CENTER|
                 RADIUS, strokeCap ROUND|SQUARE|PROJECT,
                 blendMode BLEND|ADD|SUBTRACT|...|BURN
  shape builder— beginShape kinds, vertex/bezierVertex/quadraticVertex/
                 curveVertex, contours (holes via even-odd parity),
                 endShape(CLOSE)
  transforms   — 4x4 matrix stack, rotate/scale/shear/translate (+X/Y/Z
                 rotations). '3D' canvases render through Processing's
                 default perspective camera (fov 60°, eye over the
                 center, z=0 plane 1:1 with pixels) with a software
                 z-buffer: box/sphere/3D vertex shapes rasterize filled
                 faces with inverse-depth occlusion; strokes draw
                 projected on top (the reference's P3D is OpenGL;
                 this is a headless software rasterizer)
  typography   — built-in 5x7 bitmap font (font5x7.py), textAlign/
                 textSize/textLeading/textWidth/ascent/descent
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

from warp10_platform_spark.canvas import font5x7

# Processing constants (processing.core.PConstants values are public API;
# the script tier passes the NAMES, so the numeric values are ours).
CORNER, CORNERS, CENTER, RADIUS = "CORNER", "CORNERS", "CENTER", "RADIUS"
OPEN_ARC, CHORD, PIE = "OPEN", "CHORD", "PIE"

_TWO_PI = 2.0 * math.pi


def _clamp255(v: float) -> int:
    return 0 if v <= 0 else 255 if v >= 255 else int(v)


def compose_argb(a: int, r: int, g: int, b: int) -> int:
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def split_argb(c: int):
    c &= 0xFFFFFFFF
    return (c >> 24) & 0xFF, (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF


def _hsb_to_rgb(h: float, s: float, v: float):
    """h,s,v in [0,1] → r,g,b in [0,255] (java.awt.Color.HSBtoRGB math)."""
    if s <= 0:
        val = _clamp255(v * 255.0 + 0.5)
        return val, val, val
    h = (h - math.floor(h)) * 6.0
    i = int(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    r, g, b = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)][i % 6]
    return _clamp255(r * 255.0 + 0.5), _clamp255(g * 255.0 + 0.5), _clamp255(b * 255.0 + 0.5)


def _rgb_to_hsb(r: int, g: int, b: int):
    """r,g,b 0-255 → h,s,v in [0,1] (java.awt.Color.RGBtoHSB math)."""
    mx, mn = max(r, g, b), min(r, g, b)
    v = mx / 255.0
    s = 0.0 if mx == 0 else (mx - mn) / mx
    if s == 0:
        h = 0.0
    else:
        d = float(mx - mn)
        rc, gc, bc = (mx - r) / d, (mx - g) / d, (mx - b) / d
        if r == mx:
            h = bc - gc
        elif g == mx:
            h = 2.0 + rc - bc
        else:
            h = 4.0 + gc - rc
        h /= 6.0
        if h < 0:
            h += 1.0
    return h, s, v


class PImage:
    """ARGB raster (Processing PImage surface: pixels/get/set/copy/
    resize/mask/filter/blend)."""

    def __init__(self, width: int, height: int, pix: np.ndarray | None = None):
        self.width = int(width)
        self.height = int(height)
        if pix is None:
            pix = np.zeros((self.height, self.width), dtype=np.uint32)
        self.pix = pix

    # ---- pixel access ----

    def get(self, x: int | None = None, y: int | None = None,
            w: int | None = None, h: int | None = None):
        if x is None:
            return PImage(self.width, self.height, self.pix.copy())
        if w is None:
            if 0 <= x < self.width and 0 <= y < self.height:
                return int(self.pix[int(y), int(x)])
            return 0
        x, y, w, h = int(x), int(y), int(w), int(h)
        out = np.zeros((h, w), dtype=np.uint32)
        x0, y0 = max(0, x), max(0, y)
        x1, y1 = min(self.width, x + w), min(self.height, y + h)
        if x1 > x0 and y1 > y0:
            out[y0 - y : y1 - y, x0 - x : x1 - x] = self.pix[y0:y1, x0:x1]
        return PImage(w, h, out)

    def set(self, x: int, y: int, value) -> None:
        if isinstance(value, PImage):
            self._paste(value, int(x), int(y))
            return
        x, y = int(x), int(y)
        if 0 <= x < self.width and 0 <= y < self.height:
            self.pix[y, x] = np.uint32(int(value) & 0xFFFFFFFF)

    def _paste(self, img: "PImage", x: int, y: int) -> None:
        x0, y0 = max(0, x), max(0, y)
        x1 = min(self.width, x + img.width)
        y1 = min(self.height, y + img.height)
        if x1 > x0 and y1 > y0:
            self.pix[y0:y1, x0:x1] = img.pix[y0 - y : y1 - y, x0 - x : x1 - x]

    def pixels(self) -> list[int]:
        return [int(v) for v in self.pix.reshape(-1)]

    def set_pixels(self, values) -> None:
        if len(values) != self.width * self.height:
            raise ValueError(
                f"expected {self.width * self.height} pixels, got {len(values)}"
            )
        self.pix = np.array(
            [int(v) & 0xFFFFFFFF for v in values], dtype=np.uint32
        ).reshape(self.height, self.width)

    # ---- whole-image ops ----

    def copy_region(self, src: "PImage", sx, sy, sw, sh, dx, dy, dw, dh) -> None:
        """copy(): nearest-neighbor scaled region copy (REPLACE semantics)."""
        sub = src.get(sx, sy, sw, sh)
        scaled = sub.resized(dw, dh)
        self._paste(scaled, int(dx), int(dy))

    def resized(self, w: int, h: int) -> "PImage":
        """Nearest-neighbor resize (deterministic; Processing's resize is
        a platform-dependent smooth scale — documented deviation)."""
        w, h = int(w), int(h)
        if w <= 0 or h <= 0:
            raise ValueError("resize needs positive dimensions")
        ys = (np.arange(h) * self.height) // h
        xs = (np.arange(w) * self.width) // w
        return PImage(w, h, self.pix[np.ix_(ys, xs)])

    def resize(self, w: int, h: int) -> None:
        r = self.resized(w, h)
        self.width, self.height, self.pix = r.width, r.height, r.pix

    def mask(self, source) -> None:
        """mask(img) uses the source's blue channel as this image's alpha;
        mask(list) uses the values directly (Processing PImage.mask)."""
        if isinstance(source, PImage):
            if (source.width, source.height) != (self.width, self.height):
                raise ValueError("mask image must match dimensions")
            alpha = (source.pix & 0xFF).astype(np.uint32)
        else:
            alpha = np.array([int(v) & 0xFF for v in source], dtype=np.uint32)
            if alpha.size != self.width * self.height:
                raise ValueError("mask list must match pixel count")
            alpha = alpha.reshape(self.height, self.width)
        self.pix = (self.pix & np.uint32(0x00FFFFFF)) | (alpha << np.uint32(24))

    def filter(self, kind: str, param: float | None = None) -> None:
        a = (self.pix >> 24) & 0xFF
        r = ((self.pix >> 16) & 0xFF).astype(np.float64)
        g = ((self.pix >> 8) & 0xFF).astype(np.float64)
        b = (self.pix & 0xFF).astype(np.float64)
        kind = kind.upper()
        if kind == "GRAY":
            # Processing uses the luminance weights 0.30/0.59/0.11 scaled
            lum = np.floor(0.30 * r + 0.59 * g + 0.11 * b)
            r = g = b = lum
        elif kind == "INVERT":
            r, g, b = 255 - r, 255 - g, 255 - b
        elif kind == "OPAQUE":
            a = np.full_like(a, 255)
        elif kind == "THRESHOLD":
            t = 0.5 if param is None else float(param)
            lum = np.maximum(np.maximum(r, g), b)
            on = (lum / 255.0) >= t
            r = g = b = np.where(on, 255.0, 0.0)
        elif kind == "POSTERIZE":
            n = int(param if param is not None else 4)
            if n < 2:
                raise ValueError("POSTERIZE level must be >= 2")

            def post(ch):
                lv = np.floor(ch * n / 256.0)
                return np.floor(lv * 255.0 / (n - 1))

            r, g, b = post(r), post(g), post(b)
        elif kind == "ERODE" or kind == "DILATE":
            lum = 0.30 * r + 0.59 * g + 0.11 * b
            pick = np.less if kind == "ERODE" else np.greater
            rr, gg, bb = r.copy(), g.copy(), b.copy()
            for dy, dx in ((0, -1), (0, 1), (-1, 0), (1, 0)):
                sl = np.roll(lum, (dy, dx), (0, 1))
                sr = np.roll(r, (dy, dx), (0, 1))
                sg = np.roll(g, (dy, dx), (0, 1))
                sb = np.roll(b, (dy, dx), (0, 1))
                better = pick(sl, lum)
                rr = np.where(better, sr, rr)
                gg = np.where(better, sg, gg)
                bb = np.where(better, sb, bb)
                lum = np.where(better, sl, lum)
            r, g, b = rr, gg, bb
        elif kind == "BLUR":
            rad = max(1, int(param if param is not None else 1))
            size = 2 * rad + 1
            for _ in range(2):  # two box passes ≈ smooth blur, deterministic
                for axis in (0, 1):
                    ker = np.ones(size) / size
                    r = _conv1d(r, ker, axis)
                    g = _conv1d(g, ker, axis)
                    b = _conv1d(b, ker, axis)
            r, g, b = np.floor(r + 0.5), np.floor(g + 0.5), np.floor(b + 0.5)
        else:
            raise ValueError(f"unknown filter {kind}")
        self.pix = (
            (a.astype(np.uint32) << 24)
            | (np.clip(r, 0, 255).astype(np.uint32) << 16)
            | (np.clip(g, 0, 255).astype(np.uint32) << 8)
            | np.clip(b, 0, 255).astype(np.uint32)
        )

    def blend_region(self, src: "PImage", sx, sy, sw, sh, dx, dy, dw, dh, mode: str) -> None:
        sub = src.get(sx, sy, sw, sh).resized(dw, dh)
        dx, dy = int(dx), int(dy)
        x0, y0 = max(0, dx), max(0, dy)
        x1 = min(self.width, dx + sub.width)
        y1 = min(self.height, dy + sub.height)
        if x1 <= x0 or y1 <= y0:
            return
        dst = self.pix[y0:y1, x0:x1]
        s = sub.pix[y0 - dy : y1 - dy, x0 - dx : x1 - dx]
        self.pix[y0:y1, x0:x1] = _blend_arrays(dst, s, mode)

    # ---- PNG ----

    def encode_png(self, chunks: dict | None = None) -> bytes:
        return encode_png_rgba(self, chunks)


def _conv1d(arr: np.ndarray, ker: np.ndarray, axis: int) -> np.ndarray:
    pad = len(ker) // 2
    if axis == 0:
        padded = np.pad(arr, ((pad, pad), (0, 0)), mode="edge")
        return np.apply_along_axis(lambda m: np.convolve(m, ker, "valid"), 0, padded)
    padded = np.pad(arr, ((0, 0), (pad, pad)), mode="edge")
    return np.apply_along_axis(lambda m: np.convolve(m, ker, "valid"), 1, padded)


def _blend_arrays(dst: np.ndarray, src: np.ndarray, mode: str) -> np.ndarray:
    """Per-channel blend of ARGB uint32 arrays (Processing blend modes)."""
    sa = ((src >> 24) & 0xFF).astype(np.float64) / 255.0
    out = dst.copy()
    channels = []
    for shift in (16, 8, 0):
        d = ((dst >> shift) & 0xFF).astype(np.float64)
        s = ((src >> shift) & 0xFF).astype(np.float64)
        mode_u = mode.upper()
        if mode_u == "REPLACE":
            v = s
        elif mode_u == "BLEND":
            v = d + (s - d) * sa
        elif mode_u == "ADD":
            v = d + s * sa
        elif mode_u == "SUBTRACT":
            v = d - s * sa
        elif mode_u == "LIGHTEST":
            v = d + (np.maximum(d, s) - d) * sa
        elif mode_u == "DARKEST":
            v = d + (np.minimum(d, s) - d) * sa
        elif mode_u == "DIFFERENCE":
            v = d + (np.abs(d - s) - d) * sa
        elif mode_u == "EXCLUSION":
            v = d + ((d + s - 2.0 * d * s / 255.0) - d) * sa
        elif mode_u == "MULTIPLY":
            v = d + (d * s / 255.0 - d) * sa
        elif mode_u == "SCREEN":
            v = d + ((255.0 - (255.0 - d) * (255.0 - s) / 255.0) - d) * sa
        elif mode_u == "OVERLAY":
            ov = np.where(d < 128.0, 2.0 * d * s / 255.0,
                          255.0 - 2.0 * (255.0 - d) * (255.0 - s) / 255.0)
            v = d + (ov - d) * sa
        elif mode_u == "HARD_LIGHT":
            hl = np.where(s < 128.0, 2.0 * d * s / 255.0,
                          255.0 - 2.0 * (255.0 - d) * (255.0 - s) / 255.0)
            v = d + (hl - d) * sa
        elif mode_u == "SOFT_LIGHT":
            sl = d * s / 255.0 + d * d / 255.0 - d * d * s / (255.0 * 255.0)
            v = d + (sl - d) * sa
        elif mode_u == "DODGE":
            with np.errstate(divide="ignore", invalid="ignore"):
                dg = np.where(s >= 255.0, 255.0, np.minimum(255.0, d * 255.0 / (255.0 - s)))
            v = d + (dg - d) * sa
        elif mode_u == "BURN":
            with np.errstate(divide="ignore", invalid="ignore"):
                bn = np.where(s <= 0.0, 0.0, np.maximum(0.0, 255.0 - (255.0 - d) * 255.0 / s))
            v = d + (bn - d) * sa
        else:
            raise ValueError(f"unknown blend mode {mode}")
        channels.append(np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint32) << shift)
    da = (dst >> 24) & 0xFF
    srca = (src >> 24) & 0xFF
    na = np.maximum(da, srca).astype(np.uint32)  # keep the more opaque alpha
    out = (na << 24) | channels[0] | channels[1] | channels[2]
    return out


# --------------------------------------------------------------- canvas

class _Style:
    __slots__ = (
        "fill_on", "fill_color", "stroke_on", "stroke_color", "stroke_weight",
        "stroke_cap", "stroke_join", "color_mode", "color_max",
        "rect_mode", "ellipse_mode", "image_mode", "shape_mode",
        "text_size", "text_align", "text_align_y", "text_leading",
        "bezier_detail", "curve_detail", "curve_tightness", "blend_mode",
        "tint_on", "tint_color", "sphere_detail",
    )

    def __init__(self):
        self.fill_on = True
        self.fill_color = 0xFFFFFFFF
        self.stroke_on = True
        self.stroke_color = 0xFF000000
        self.stroke_weight = 1.0
        self.stroke_cap = "ROUND"
        self.stroke_join = "MITER"
        self.color_mode = "RGB"
        self.color_max = [255.0, 255.0, 255.0, 255.0]
        self.rect_mode = CORNER
        self.ellipse_mode = CENTER
        self.image_mode = CORNER
        self.shape_mode = CORNER
        self.text_size = 12.0
        self.text_align = "LEFT"
        self.text_align_y = "BASELINE"
        self.text_leading = 12.0 * 1.275
        self.bezier_detail = 20
        self.curve_detail = 20
        self.curve_tightness = 0.0
        self.blend_mode = "BLEND"
        self.tint_on = False
        self.tint_color = 0xFFFFFFFF
        self.sphere_detail = 30

    def copy(self) -> "_Style":
        s = _Style.__new__(_Style)
        for k in _Style.__slots__:
            v = getattr(self, k)
            setattr(s, k, list(v) if isinstance(v, list) else v)
        return s


class PCanvas(PImage):
    """The PGraphics stand-in the P* stack functions drive."""

    def __init__(self, width: int, height: int, kind: str = "2D"):
        super().__init__(width, height)
        self.kind = kind
        self.style = _Style()
        self._style_stack: list[_Style] = []
        self.matrix = np.eye(4)
        self._matrix_stack: list[np.ndarray] = []
        self.clip_rect: tuple[float, float, float, float] | None = None
        self._shape = None  # active beginShape state
        self.pix[:] = np.uint32(0x00000000)  # transparent like PGraphics
        # True P3D: Processing's default perspective camera — fov 60°,
        # eye at (w/2, h/2, (h/2)/tan(30°)) looking down -z, so the z=0
        # plane maps 1:1 to screen pixels; nearer-z occludes via an
        # inverse-depth buffer (0 = empty, larger = nearer).
        self.is3d = str(kind).startswith("3D")
        if self.is3d:
            self._eye_z = (self.height / 2.0) / math.tan(math.pi / 6.0)
            self._zinv = np.zeros((self.height, self.width), dtype=np.float64)
        else:
            self._eye_z = None
            self._zinv = None

    # ---------------- color model ----------------

    def color(self, *args) -> int:
        st = self.style
        m1, m2, m3, ma = st.color_max
        if len(args) == 1:
            v = args[0]
            if isinstance(v, int) and (v & 0xFF000000):
                return v & 0xFFFFFFFF
            gray = _clamp255(float(v) * 255.0 / m1)
            return compose_argb(255, gray, gray, gray)
        if len(args) == 2:
            v, a = args
            al = _clamp255(float(a) * 255.0 / ma)
            if isinstance(v, int) and (v & 0xFF000000):
                return compose_argb(al, *split_argb(v)[1:])
            gray = _clamp255(float(v) * 255.0 / m1)
            return compose_argb(al, gray, gray, gray)
        if len(args) == 3:
            c1, c2, c3 = args
            al = 255
        else:
            c1, c2, c3, a = args
            al = _clamp255(float(a) * 255.0 / ma)
        if st.color_mode == "HSB":
            r, g, b = _hsb_to_rgb(
                float(c1) / m1, min(1.0, float(c2) / m2), min(1.0, float(c3) / m3)
            )
        else:
            r = _clamp255(float(c1) * 255.0 / m1)
            g = _clamp255(float(c2) * 255.0 / m2)
            b = _clamp255(float(c3) * 255.0 / m3)
        return compose_argb(al, r, g, b)

    def channel(self, c: int, which: str) -> float:
        a, r, g, b = split_argb(int(c))
        m1, m2, m3, ma = self.style.color_max
        if which == "alpha":
            return a * ma / 255.0
        if self.style.color_mode == "HSB" and which in ("hue", "saturation", "brightness"):
            h, s, v = _rgb_to_hsb(r, g, b)
            return {"hue": h * m1, "saturation": s * m2, "brightness": v * m3}[which]
        if which == "red" or which == "hue":
            return r * m1 / 255.0
        if which == "green" or which == "saturation":
            return g * m2 / 255.0
        return b * m3 / 255.0

    def lerp_color(self, c1: int, c2: int, t: float) -> int:
        t = min(1.0, max(0.0, float(t)))
        a1, r1, g1, b1 = split_argb(int(c1))
        a2, r2, g2, b2 = split_argb(int(c2))
        return compose_argb(
            int(a1 + (a2 - a1) * t), int(r1 + (r2 - r1) * t),
            int(g1 + (g2 - g1) * t), int(b1 + (b2 - b1) * t),
        )

    # ---------------- transforms ----------------

    def _mul(self, m: np.ndarray) -> None:
        self.matrix = self.matrix @ m

    def translate(self, x: float, y: float, z: float = 0.0) -> None:
        m = np.eye(4)
        m[0, 3], m[1, 3], m[2, 3] = x, y, z
        self._mul(m)

    def scale(self, sx: float, sy: float | None = None, sz: float = 1.0) -> None:
        if sy is None:
            sy = sz = sx
        m = np.diag([sx, sy, sz, 1.0])
        self._mul(m)

    def rotate(self, a: float) -> None:
        self.rotate_z(a)

    def rotate_z(self, a: float) -> None:
        c, s = math.cos(a), math.sin(a)
        m = np.eye(4)
        m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
        self._mul(m)

    def rotate_x(self, a: float) -> None:
        c, s = math.cos(a), math.sin(a)
        m = np.eye(4)
        m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
        self._mul(m)

    def rotate_y(self, a: float) -> None:
        c, s = math.cos(a), math.sin(a)
        m = np.eye(4)
        m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
        self._mul(m)

    def shear_x(self, a: float) -> None:
        m = np.eye(4)
        m[0, 1] = math.tan(a)
        self._mul(m)

    def shear_y(self, a: float) -> None:
        m = np.eye(4)
        m[1, 0] = math.tan(a)
        self._mul(m)

    def push_matrix(self) -> None:
        self._matrix_stack.append(self.matrix.copy())

    def pop_matrix(self) -> None:
        if not self._matrix_stack:
            raise ValueError("popMatrix without pushMatrix")
        self.matrix = self._matrix_stack.pop()

    def reset_matrix(self) -> None:
        self.matrix = np.eye(4)

    def push_style(self) -> None:
        self._style_stack.append(self.style.copy())

    def pop_style(self) -> None:
        if not self._style_stack:
            raise ValueError("popStyle without pushStyle")
        self.style = self._style_stack.pop()

    def _xf(self, pts):
        """Model → device: apply the 4x4; 2D projects orthographically,
        3D through the default perspective camera."""
        if self.is3d:
            return self._xf3(pts)[0]  # strokes use the near-clamped xy
        arr = np.asarray(pts, dtype=np.float64)
        if arr.ndim == 1:
            arr = arr[None, :]
        n = arr.shape[0]
        hom = np.zeros((n, 4))
        hom[:, : arr.shape[1]] = arr
        hom[:, 3] = 1.0
        dev = hom @ self.matrix.T
        return dev[:, :2]

    def _xf3(self, pts):
        """Model → (screen xy, inverse view depth, behind-camera flag).
        The z=0 plane maps 1:1 to pixels; points nearer the eye magnify
        (sx = cx + (x-cx)·ez/(ez-z)). Points at or behind the near
        plane are flagged; fills skip triangles touching them (strokes
        keep the near-clamped projection — documented stand-in for true
        frustum clipping)."""
        arr = np.asarray(pts, dtype=np.float64)
        if arr.ndim == 1:
            arr = arr[None, :]
        n = arr.shape[0]
        hom = np.zeros((n, 4))
        hom[:, : arr.shape[1]] = arr
        hom[:, 3] = 1.0
        dev = hom @ self.matrix.T
        cx, cy = self.width / 2.0, self.height / 2.0
        near = self._eye_z / 10.0  # Processing's default near plane
        raw = self._eye_z - dev[:, 2]
        behind = raw <= near
        depth = np.maximum(raw, near)
        s = self._eye_z / depth
        out = np.empty((n, 2))
        out[:, 0] = cx + (dev[:, 0] - cx) * s
        out[:, 1] = cy + (dev[:, 1] - cy) * s
        return out, 1.0 / depth, behind

    def _fill_triangle_z(self, xy: np.ndarray, zinv: np.ndarray, color: int) -> None:
        """Z-buffered triangle fill: barycentric rasterization with
        screen-linear interpolation of 1/depth (projectively exact for
        planar faces). Nearer fragments win; painting goes through
        _paint so blend mode and exact clip match the 2D primitives."""
        g = self._grid(float(xy[:, 0].min()), float(xy[:, 1].min()),
                       float(xy[:, 0].max()), float(xy[:, 1].max()))
        if g is None:
            return
        ix0, iy0, xs, ys = g
        (x0, y0), (x1, y1), (x2, y2) = xy
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        if abs(area) < 1e-12:
            return
        w0 = ((x1 - xs) * (y2 - ys) - (x2 - xs) * (y1 - ys)) / area
        w1 = ((x2 - xs) * (y0 - ys) - (x0 - xs) * (y2 - ys)) / area
        w2 = 1.0 - w0 - w1
        mask = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if self.clip_rect is not None:  # exact clip, same test as _paint
            cx0, cy0, cx1, cy1 = self.clip_rect
            mask = mask & (xs >= cx0) & (xs < cx1) & (ys >= cy0) & (ys < cy1)
        if not mask.any():
            return
        frag = w0 * zinv[0] + w1 * zinv[1] + w2 * zinv[2]
        h, w = mask.shape
        zwin = self._zinv[iy0 : iy0 + h, ix0 : ix0 + w]
        win = mask & (frag > zwin)
        if not win.any():
            return
        zwin[win] = frag[win]
        self._paint(ix0, iy0, win, color)

    def _fill_faces_z(self, faces, color: int) -> None:
        """faces: iterable of model-space vertex rings (≥3 verts each);
        fan-triangulated, z-buffer filled. Triangles with any vertex at
        or behind the near plane are dropped (no phantom projections)."""
        for ring in faces:
            xy, zi, behind = self._xf3(ring)
            for i in range(1, len(ring) - 1):
                idx = [0, i, i + 1]
                if behind[idx].any():
                    continue
                self._fill_triangle_z(xy[idx], zi[idx], color)

    def _is_axis_aligned(self) -> bool:
        m = self.matrix
        return (
            m[0, 1] == 0 and m[1, 0] == 0 and m[0, 2] == 0 and m[1, 2] == 0
            and m[2, 0] == 0 and m[2, 1] == 0
        )

    # ---------------- raster core ----------------

    def _grid(self, x0: float, y0: float, x1: float, y1: float):
        """Pixel-center grids over a device-space bbox, clipped."""
        if self.clip_rect is not None:
            cx0, cy0, cx1, cy1 = self.clip_rect
            x0, y0 = max(x0, cx0), max(y0, cy0)
            x1, y1 = min(x1, cx1), min(y1, cy1)
        ix0 = max(0, int(math.floor(x0 - 0.5)))
        iy0 = max(0, int(math.floor(y0 - 0.5)))
        ix1 = min(self.width - 1, int(math.ceil(x1)))
        iy1 = min(self.height - 1, int(math.ceil(y1)))
        if ix1 < ix0 or iy1 < iy0:
            return None
        xs = np.arange(ix0, ix1 + 1, dtype=np.float64) + 0.5
        ys = np.arange(iy0, iy1 + 1, dtype=np.float64) + 0.5
        return ix0, iy0, xs[None, :], ys[:, None]

    def _paint(self, ix0: int, iy0: int, mask: np.ndarray, color: int) -> None:
        h, w = mask.shape
        if self.clip_rect is not None:
            cx0, cy0, cx1, cy1 = self.clip_rect
            X = np.arange(ix0, ix0 + w, dtype=np.float64)[None, :] + 0.5
            Y = np.arange(iy0, iy0 + h, dtype=np.float64)[:, None] + 0.5
            mask = mask & (X >= cx0) & (X < cx1) & (Y >= cy0) & (Y < cy1)
        dst = self.pix[iy0 : iy0 + h, ix0 : ix0 + w]
        src = np.full(mask.shape, np.uint32(color & 0xFFFFFFFF))
        blended = _blend_arrays(dst, src, self.style.blend_mode)
        self.pix[iy0 : iy0 + h, ix0 : ix0 + w] = np.where(mask, blended, dst)

    def _fill_rings_device(self, rings, color: int) -> None:
        """Even-odd fill of device-space rings (pixel-center ray cast —
        exactly the predicate wkt.rings_contains_sql replays in SQL)."""
        allpts = np.vstack([np.asarray(r) for r in rings if len(r)])
        g = self._grid(allpts[:, 0].min(), allpts[:, 1].min(),
                       allpts[:, 0].max(), allpts[:, 1].max())
        if g is None:
            return
        ix0, iy0, X, Y = g
        inside = np.zeros((Y.shape[0], X.shape[1]), dtype=bool)
        for ring in rings:
            pts = np.asarray(ring, dtype=np.float64)
            if len(pts) < 3:
                continue
            x1s, y1s = pts[:, 0], pts[:, 1]
            x2s, y2s = np.roll(x1s, -1), np.roll(y1s, -1)
            for x1, y1, x2, y2 in zip(x1s, y1s, x2s, y2s):
                if y1 == y2:
                    continue
                crosses = (y1 <= Y) != (y2 <= Y)
                with np.errstate(invalid="ignore"):
                    xi = x1 + (Y - y1) * (x2 - x1) / (y2 - y1)
                inside ^= crosses & (X < xi)
        if inside.any():
            self._paint(ix0, iy0, inside, color)

    def _stroke_polyline_device(self, pts: np.ndarray, color: int,
                                closed: bool) -> None:
        """Stroke = distance-to-segment ≤ weight/2 coverage."""
        w2 = max(self.style.stroke_weight, 1.0) / 2.0
        pts = np.asarray(pts, dtype=np.float64)
        n = len(pts)
        if n == 0:
            return
        if n == 1:
            self._dot(pts[0], color)
            return
        segs = list(range(n if closed else n - 1))
        cap = self.style.stroke_cap
        for i in segs:
            p = pts[i]
            q = pts[(i + 1) % n]
            self._stroke_segment(p, q, w2, color, cap, closed or 0 < i,
                                 closed or i < n - 2)

    def _stroke_segment(self, p, q, w2: float, color: int, cap: str,
                        join_start: bool, join_end: bool) -> None:
        px, py = p
        qx, qy = q
        ext = w2 + 1.0
        g = self._grid(min(px, qx) - ext, min(py, qy) - ext,
                       max(px, qx) + ext, max(py, qy) + ext)
        if g is None:
            return
        ix0, iy0, X, Y = g
        dx, dy = qx - px, qy - py
        ll = dx * dx + dy * dy
        if ll == 0:
            t = np.zeros_like(X + Y)
        else:
            t = ((X - px) * dx + (Y - py) * dy) / ll
        if cap == "PROJECT":
            # extend half a weight beyond each open end
            t = np.clip(t, -w2 / math.sqrt(ll) if ll else 0.0,
                        1.0 + (w2 / math.sqrt(ll) if ll else 0.0))
            cx, cy = px + t * dx, py + t * dy
            mask = (X - cx) ** 2 + (Y - cy) ** 2 <= w2 * w2
        elif cap == "SQUARE":
            # butt cap: no disc beyond the endpoints
            tc = np.clip(t, 0.0, 1.0)
            cx, cy = px + tc * dx, py + tc * dy
            mask = ((X - cx) ** 2 + (Y - cy) ** 2 <= w2 * w2) & (t >= 0.0) & (t <= 1.0)
            if join_start or join_end:
                tcap = np.clip(t, 0.0, 1.0)
                ccx, ccy = px + tcap * dx, py + tcap * dy
                disc = (X - ccx) ** 2 + (Y - ccy) ** 2 <= w2 * w2
                ends = np.zeros_like(disc)
                if join_start:
                    ends |= (X - px) ** 2 + (Y - py) ** 2 <= w2 * w2
                if join_end:
                    ends |= (X - qx) ** 2 + (Y - qy) ** 2 <= w2 * w2
                mask |= disc & ends
        else:  # ROUND (default): clamp → round caps and joins for free
            tc = np.clip(t, 0.0, 1.0)
            cx, cy = px + tc * dx, py + tc * dy
            mask = (X - cx) ** 2 + (Y - cy) ** 2 <= w2 * w2
        if mask.any():
            self._paint(ix0, iy0, mask, color)

    def _dot(self, p, color: int) -> None:
        w2 = max(self.style.stroke_weight, 1.0) / 2.0
        px, py = p
        g = self._grid(px - w2 - 1, py - w2 - 1, px + w2 + 1, py + w2 + 1)
        if g is None:
            return
        ix0, iy0, X, Y = g
        mask = (X - px) ** 2 + (Y - py) ** 2 <= w2 * w2
        if mask.any():
            self._paint(ix0, iy0, mask, color)

    # ---------------- primitives ----------------

    def background(self, *args) -> None:
        c = args[0] if len(args) == 1 and isinstance(args[0], PImage) else None
        if c is not None:
            self.pix[:] = c.resized(self.width, self.height).pix
            if self._zinv is not None:
                self._zinv[:] = 0.0
            return
        col = self.color(*args)
        # background is always opaque in Processing unless alpha given
        if len(args) < 2 and not (
            len(args) == 1 and isinstance(args[0], int) and (args[0] & 0xFF000000) != 0xFF000000 and (args[0] & 0xFF000000)
        ):
            col |= 0xFF000000
        self.pix[:] = np.uint32(col & 0xFFFFFFFF)
        if self._zinv is not None:  # background clears depth (Processing)
            self._zinv[:] = 0.0

    def clear(self) -> None:
        self.pix[:] = np.uint32(0)
        if self._zinv is not None:
            self._zinv[:] = 0.0

    def point(self, x: float, y: float, z: float = 0.0) -> None:
        if not self.style.stroke_on:
            return
        (p,) = self._xf([(x, y, z)])
        self._dot(p, self.style.stroke_color)

    def line(self, x1, y1, *rest) -> None:
        if not self.style.stroke_on:
            return
        if len(rest) == 2:
            pts = [(x1, y1, 0.0), (rest[0], rest[1], 0.0)]
        else:  # 3D form x1 y1 z1 x2 y2 z2
            z1, x2, y2, z2 = rest
            pts = [(x1, y1, z1), (x2, y2, z2)]
        dev = self._xf(pts)
        self._stroke_polyline_device(dev, self.style.stroke_color, closed=False)

    def _mode_corners(self, a, b, c, d, mode: str):
        if mode == CORNERS:
            x0, y0, x1, y1 = a, b, c, d
        elif mode == CENTER:
            x0, y0, x1, y1 = a - c / 2.0, b - d / 2.0, a + c / 2.0, b + d / 2.0
        elif mode == RADIUS:
            x0, y0, x1, y1 = a - c, b - d, a + c, b + d
        else:  # CORNER
            x0, y0, x1, y1 = a, b, a + c, b + d
        return min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1)

    def rect(self, a, b, c, d, *radii) -> None:
        x0, y0, x1, y1 = self._mode_corners(a, b, c, d, self.style.rect_mode)
        if radii and any(float(r) > 0 for r in radii):
            self._rounded_rect(x0, y0, x1, y1, radii)
            return
        ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        self._draw_ring(ring)

    def _rounded_rect(self, x0, y0, x1, y1, radii) -> None:
        if len(radii) == 1:
            tl = tr = br = bl = float(radii[0])
        else:
            tl, tr, br, bl = (list(map(float, radii)) + [0.0] * 4)[:4]
        mx = min(x1 - x0, y1 - y0) / 2.0
        tl, tr, br, bl = (min(r, mx) for r in (tl, tr, br, bl))
        ring = []

        def arc_pts(cx, cy, r, start):
            n = 12
            return [
                (cx + r * math.cos(start + (math.pi / 2) * i / n),
                 cy + r * math.sin(start + (math.pi / 2) * i / n))
                for i in range(n + 1)
            ]

        ring += arc_pts(x0 + tl, y0 + tl, tl, math.pi) if tl > 0 else [(x0, y0)]
        ring += arc_pts(x1 - tr, y0 + tr, tr, 1.5 * math.pi) if tr > 0 else [(x1, y0)]
        ring += arc_pts(x1 - br, y1 - br, br, 0.0) if br > 0 else [(x1, y1)]
        ring += arc_pts(x0 + bl, y1 - bl, bl, 0.5 * math.pi) if bl > 0 else [(x0, y1)]
        self._draw_ring(ring)

    def _draw_ring(self, ring) -> None:
        dev = self._xf([(x, y, 0.0) for x, y in ring])
        if self.style.fill_on:
            self._fill_rings_device([dev], self.style.fill_color)
        if self.style.stroke_on:
            self._stroke_polyline_device(dev, self.style.stroke_color, closed=True)

    def quad(self, x1, y1, x2, y2, x3, y3, x4, y4) -> None:
        self._draw_ring([(x1, y1), (x2, y2), (x3, y3), (x4, y4)])

    def triangle(self, x1, y1, x2, y2, x3, y3) -> None:
        self._draw_ring([(x1, y1), (x2, y2), (x3, y3)])

    def ellipse(self, a, b, c, d) -> None:
        x0, y0, x1, y1 = self._mode_corners(a, b, c, d, self.style.ellipse_mode)
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = (x1 - x0) / 2.0, (y1 - y0) / 2.0
        if rx <= 0 or ry <= 0:
            return
        if self._is_axis_aligned():
            # exact membership — the SQL-replayable fast path
            m = self.matrix
            dcx, dcy = cx * m[0, 0] + m[0, 3], cy * m[1, 1] + m[1, 3]
            drx, dry = abs(rx * m[0, 0]), abs(ry * m[1, 1])
            if self.style.fill_on:
                g = self._grid(dcx - drx, dcy - dry, dcx + drx, dcy + dry)
                if g is not None:
                    ix0, iy0, X, Y = g
                    mask = ((X - dcx) / drx) ** 2 + ((Y - dcy) / dry) ** 2 <= 1.0
                    if mask.any():
                        self._paint(ix0, iy0, mask, self.style.fill_color)
            if self.style.stroke_on:
                ring = self._ellipse_ring(cx, cy, rx, ry)
                dev = self._xf([(x, y, 0.0) for x, y in ring])
                self._stroke_polyline_device(dev, self.style.stroke_color, closed=True)
            return
        ring = self._ellipse_ring(cx, cy, rx, ry)
        self._draw_ring(ring)

    @staticmethod
    def _ellipse_ring(cx, cy, rx, ry, n: int = 96):
        return [
            (cx + rx * math.cos(_TWO_PI * i / n), cy + ry * math.sin(_TWO_PI * i / n))
            for i in range(n)
        ]

    def arc(self, a, b, c, d, start: float, stop: float, mode: str = OPEN_ARC) -> None:
        x0, y0, x1, y1 = self._mode_corners(a, b, c, d, self.style.ellipse_mode)
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = (x1 - x0) / 2.0, (y1 - y0) / 2.0
        if stop < start:
            start, stop = stop, start
        span = min(stop - start, _TWO_PI)
        n = max(3, int(math.ceil(96 * span / _TWO_PI)))
        pts = [
            (cx + rx * math.cos(start + span * i / n),
             cy + ry * math.sin(start + span * i / n))
            for i in range(n + 1)
        ]
        if self.style.fill_on:
            ring = pts if mode == CHORD else pts + [(cx, cy)]
            dev = self._xf([(x, y, 0.0) for x, y in ring])
            self._fill_rings_device([dev], self.style.fill_color)
        if self.style.stroke_on:
            if mode == PIE:
                outline, closed = pts + [(cx, cy)], True
            elif mode == CHORD:
                outline, closed = pts, True
            else:
                outline, closed = pts, False
            dev = self._xf([(x, y, 0.0) for x, y in outline])
            self._stroke_polyline_device(dev, self.style.stroke_color, closed=closed)

    # ---------------- curves ----------------

    def bezier_point(self, a, b, c, d, t) -> float:
        u = 1.0 - t
        return u ** 3 * a + 3 * u * u * t * b + 3 * u * t * t * c + t ** 3 * d

    def bezier_tangent(self, a, b, c, d, t) -> float:
        u = 1.0 - t
        return 3 * u * u * (b - a) + 6 * u * t * (c - b) + 3 * t * t * (d - c)

    def curve_point(self, a, b, c, d, t) -> float:
        """Catmull-Rom with tightness s (Processing curvePoint math)."""
        s = self.style.curve_tightness
        t2, t3 = t * t, t * t * t
        f1 = (s - 1.0) / 2.0 * t3 + (1.0 - s) * t2 + (s - 1.0) / 2.0 * t
        f2 = (s + 3.0) / 2.0 * t3 + (-5.0 - s) / 2.0 * t2 + 1.0
        f3 = (-3.0 - s) / 2.0 * t3 + (s + 2.0) * t2 + (1.0 - s) / 2.0 * t
        f4 = (1.0 - s) / 2.0 * t3 + (s - 1.0) / 2.0 * t2
        return a * f1 + b * f2 + c * f3 + d * f4

    def curve_tangent(self, a, b, c, d, t) -> float:
        s = self.style.curve_tightness
        t2 = t * t
        f1 = 3.0 * (s - 1.0) / 2.0 * t2 + 2.0 * (1.0 - s) * t + (s - 1.0) / 2.0
        f2 = 3.0 * (s + 3.0) / 2.0 * t2 + 2.0 * (-5.0 - s) / 2.0 * t
        f3 = 3.0 * (-3.0 - s) / 2.0 * t2 + 2.0 * (s + 2.0) * t + (1.0 - s) / 2.0
        f4 = 3.0 * (1.0 - s) / 2.0 * t2 + 2.0 * (s - 1.0) / 2.0 * t
        return a * f1 + b * f2 + c * f3 + d * f4

    def bezier(self, x1, y1, x2, y2, x3, y3, x4, y4) -> None:
        n = self.style.bezier_detail
        pts = [
            (self.bezier_point(x1, x2, x3, x4, i / n),
             self.bezier_point(y1, y2, y3, y4, i / n))
            for i in range(n + 1)
        ]
        dev = self._xf([(x, y, 0.0) for x, y in pts])
        if self.style.stroke_on:
            self._stroke_polyline_device(dev, self.style.stroke_color, closed=False)

    def curve(self, x1, y1, x2, y2, x3, y3, x4, y4) -> None:
        n = self.style.curve_detail
        pts = [
            (self.curve_point(x1, x2, x3, x4, i / n),
             self.curve_point(y1, y2, y3, y4, i / n))
            for i in range(n + 1)
        ]
        dev = self._xf([(x, y, 0.0) for x, y in pts])
        if self.style.stroke_on:
            self._stroke_polyline_device(dev, self.style.stroke_color, closed=False)

    # ---------------- shape builder ----------------

    def begin_shape(self, kind: str = "POLYGON") -> None:
        self._shape = {"kind": kind, "verts": [], "contours": [], "curve": []}

    def begin_contour(self) -> None:
        if self._shape is None:
            raise ValueError("beginContour outside beginShape")
        self._shape["contours"].append(self._shape["verts"])
        self._shape["verts"] = []

    def end_contour(self) -> None:
        if self._shape is None or not self._shape["contours"]:
            raise ValueError("endContour without beginContour")
        done = self._shape["verts"]
        self._shape["verts"] = self._shape["contours"].pop()
        self._shape["contours"].append(("hole", done))

    def vertex(self, x: float, y: float, z: float = 0.0) -> None:
        if self._shape is None:
            raise ValueError("vertex outside beginShape")
        if self.is3d:
            self._shape["verts"].append((float(x), float(y), float(z)))
        else:
            self._shape["verts"].append((float(x), float(y)))
        self._shape["curve"] = []

    def curve_vertex(self, x: float, y: float) -> None:
        if self._shape is None:
            raise ValueError("curveVertex outside beginShape")
        cv = self._shape["curve"]
        cv.append((float(x), float(y)))
        if len(cv) >= 4:
            a, b, c, d = cv[-4], cv[-3], cv[-2], cv[-1]
            n = self.style.curve_detail
            for i in range(n + 1):
                t = i / n
                self._shape["verts"].append(
                    (self.curve_point(a[0], b[0], c[0], d[0], t),
                     self.curve_point(a[1], b[1], c[1], d[1], t))
                )

    def bezier_vertex(self, x2, y2, x3, y3, x4, y4) -> None:
        if self._shape is None or not self._shape["verts"]:
            raise ValueError("bezierVertex needs a prior vertex")
        x1, y1 = self._shape["verts"][-1][:2]  # 3D verts carry z
        n = self.style.bezier_detail
        for i in range(1, n + 1):
            t = i / n
            self._shape["verts"].append(
                (self.bezier_point(x1, x2, x3, x4, t),
                 self.bezier_point(y1, y2, y3, y4, t))
            )

    def quadratic_vertex(self, cx, cy, x3, y3) -> None:
        if self._shape is None or not self._shape["verts"]:
            raise ValueError("quadraticVertex needs a prior vertex")
        x1, y1 = self._shape["verts"][-1][:2]
        # elevate quadratic to cubic
        self.bezier_vertex(
            x1 + 2.0 / 3.0 * (cx - x1), y1 + 2.0 / 3.0 * (cy - y1),
            x3 + 2.0 / 3.0 * (cx - x3), y3 + 2.0 / 3.0 * (cy - y3), x3, y3,
        )

    def end_shape(self, close: bool = False) -> None:
        if self._shape is None:
            raise ValueError("endShape without beginShape")
        sh = self._shape
        self._shape = None
        kind = sh["kind"]
        verts = sh["verts"]
        holes = [h for tag_h in sh["contours"] if isinstance(tag_h, tuple)
                 for h in [tag_h[1]]]
        st = self.style
        if self.is3d:
            # 3D shape path: z-buffered fills, perspective-projected
            # strokes (curve/bezier vertices arrive as 2-tuples at z=0)
            v3 = [(v[0], v[1], v[2] if len(v) > 2 else 0.0) for v in verts]
            if kind == "POINTS":
                for p in v3:
                    self.point(*p)
                return
            if kind == "LINES":
                for i in range(0, len(v3) - 1, 2):
                    self.line(v3[i][0], v3[i][1], v3[i][2],
                              v3[i + 1][0], v3[i + 1][1], v3[i + 1][2])
                return
            if kind == "TRIANGLES":
                g3 = [v3[i : i + 3] for i in range(0, len(v3) - 2, 3)]
            elif kind == "TRIANGLE_STRIP":
                g3 = [v3[i : i + 3] for i in range(len(v3) - 2)]
            elif kind == "TRIANGLE_FAN":
                g3 = [[v3[0], v3[i], v3[i + 1]] for i in range(1, len(v3) - 1)]
            elif kind == "QUADS":
                g3 = [v3[i : i + 4] for i in range(0, len(v3) - 3, 4)]
            elif kind == "QUAD_STRIP":
                g3 = [[v3[i], v3[i + 1], v3[i + 3], v3[i + 2]]
                      for i in range(0, len(v3) - 3, 2)]
            else:  # POLYGON (holes unsupported in 3D)
                g3 = [v3] if len(v3) >= 3 else []
            if st.fill_on:
                self._fill_faces_z([g for g in g3 if len(g) >= 3], st.fill_color)
            if st.stroke_on:
                for g in g3:
                    if len(g) >= 2:
                        dev = self._xf(g)
                        # triangle/quad groups are rings; POLYGON honors
                        # endShape(CLOSE) exactly like the 2D path
                        self._stroke_polyline_device(
                            dev, st.stroke_color,
                            closed=close if kind == "POLYGON" else len(g) >= 3)
            return
        if kind == "POINTS":
            for p in verts:
                self.point(*p)
            return
        if kind == "LINES":
            for i in range(0, len(verts) - 1, 2):
                self.line(verts[i][0], verts[i][1], verts[i + 1][0], verts[i + 1][1])
            return
        groups: list[list] = []
        if kind == "TRIANGLES":
            groups = [verts[i : i + 3] for i in range(0, len(verts) - 2, 3)]
        elif kind == "TRIANGLE_STRIP":
            groups = [verts[i : i + 3] for i in range(len(verts) - 2)]
        elif kind == "TRIANGLE_FAN":
            groups = [[verts[0], verts[i], verts[i + 1]] for i in range(1, len(verts) - 1)]
        elif kind == "QUADS":
            groups = [verts[i : i + 4] for i in range(0, len(verts) - 3, 4)]
        elif kind == "QUAD_STRIP":
            groups = [
                [verts[i], verts[i + 1], verts[i + 3], verts[i + 2]]
                for i in range(0, len(verts) - 3, 2)
            ]
        else:  # POLYGON
            rings = [verts] + holes
            devs = [self._xf([(x, y, 0.0) for x, y in r]) for r in rings if len(r) >= 3]
            if st.fill_on and devs:
                self._fill_rings_device(devs, st.fill_color)
            if st.stroke_on and verts:
                dev = self._xf([(x, y, 0.0) for x, y in verts])
                self._stroke_polyline_device(dev, st.stroke_color, closed=close)
                for h in holes:
                    if h:
                        devh = self._xf([(x, y, 0.0) for x, y in h])
                        self._stroke_polyline_device(devh, st.stroke_color, closed=close)
            return
        for gpts in groups:
            if len(gpts) >= 3:
                self._draw_ring(gpts)

    # ---------------- 3D wireframe ----------------

    def box(self, w: float, h: float | None = None, d: float | None = None) -> None:
        if h is None:
            h = d = w
        hw, hh, hd = w / 2.0, h / 2.0, d / 2.0
        c = [
            (sx * hw, sy * hh, sz * hd)
            for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
        ]
        st = self.style
        if self.is3d and st.fill_on:
            # 6 quads, z-buffered (corner index bit order: x=4, y=2, z=1)
            faces = [
                [c[0], c[1], c[3], c[2]], [c[4], c[5], c[7], c[6]],  # x=∓
                [c[0], c[1], c[5], c[4]], [c[2], c[3], c[7], c[6]],  # y=∓
                [c[0], c[2], c[6], c[4]], [c[1], c[3], c[7], c[5]],  # z=∓
            ]
            self._fill_faces_z(faces, st.fill_color)
        edges = [
            (0, 1), (0, 2), (0, 4), (3, 1), (3, 2), (3, 7),
            (5, 1), (5, 4), (5, 7), (6, 2), (6, 4), (6, 7),
        ]
        # edges: whenever stroking, and always when no z-fill happened
        # (2D canvases keep the historical wireframe-in-fill-color)
        if st.stroke_on or not (self.is3d and st.fill_on):
            dev = self._xf(c)
            col = st.stroke_color if st.stroke_on else st.fill_color
            for i, j in edges:
                self._stroke_polyline_device(np.array([dev[i], dev[j]]), col, closed=False)

    def sphere(self, r: float) -> None:
        n = max(4, self.style.sphere_detail)
        st = self.style

        def pt(i, k):  # latitude k ∈ [0, n/2], longitude i ∈ [0, n)
            phi = math.pi * k / (n // 2)
            th = _TWO_PI * i / n
            return (r * math.sin(phi) * math.cos(th),
                    r * math.cos(phi),
                    r * math.sin(phi) * math.sin(th))

        if self.is3d and st.fill_on:
            faces = []
            for k in range(n // 2):
                for i in range(n):
                    quad = [pt(i, k), pt(i + 1, k), pt(i + 1, k + 1), pt(i, k + 1)]
                    faces.append(quad)
            self._fill_faces_z(faces, st.fill_color)
            if not st.stroke_on:
                return
        col = st.stroke_color if st.stroke_on else st.fill_color
        for k in range(1, 4):  # 3 latitude rings + 2 meridians, wireframe
            phi = math.pi * k / 4.0
            ring = [
                (r * math.sin(phi) * math.cos(_TWO_PI * i / n),
                 r * math.cos(phi),
                 r * math.sin(phi) * math.sin(_TWO_PI * i / n))
                for i in range(n)
            ]
            dev = self._xf(ring)
            self._stroke_polyline_device(dev, col, closed=True)
        for a0 in (0.0, math.pi / 2.0):
            mer = [
                (r * math.sin(math.pi * i / n) * math.cos(a0),
                 r * math.cos(math.pi * i / n),
                 r * math.sin(math.pi * i / n) * math.sin(a0))
                for i in range(n + 1)
            ]
            dev = self._xf(mer)
            self._stroke_polyline_device(dev, col, closed=False)

    # ---------------- text ----------------

    def _text_scale(self) -> float:
        return self.style.text_size / float(font5x7.GLYPH_H + 1)

    def text_width(self, s: str) -> float:
        lines = str(s).split("\n")
        return max(len(ln) for ln in lines) * font5x7.ADVANCE * self._text_scale()

    def text_ascent(self) -> float:
        return font5x7.GLYPH_H * self._text_scale()

    def text_descent(self) -> float:
        return 2.0 * self._text_scale()

    def text(self, s: str, x: float, y: float) -> None:
        if not self.style.fill_on:
            return
        sc = self._text_scale()
        col = self.style.fill_color
        lines = str(s).split("\n")
        for li, ln in enumerate(lines):
            wpx = len(ln) * font5x7.ADVANCE * sc
            if self.style.text_align == "CENTER":
                ox = x - wpx / 2.0
            elif self.style.text_align == "RIGHT":
                ox = x - wpx
            else:
                ox = x
            ay = self.style.text_align_y
            if ay == "TOP":
                oy = y + self.text_ascent()
            elif ay == "CENTER":
                oy = y + self.text_ascent() / 2.0
            elif ay == "BOTTOM":
                oy = y - self.text_descent()
            else:  # BASELINE
                oy = y
            oy += li * self.style.text_leading
            for ci, ch in enumerate(ln):
                cols = font5x7.glyph(ch)
                gx = ox + ci * font5x7.ADVANCE * sc
                for c in range(font5x7.GLYPH_W):
                    bits = cols[c]
                    rr = 0
                    while rr < font5x7.GLYPH_H:
                        if bits >> rr & 1:
                            r0 = rr
                            while rr < font5x7.GLYPH_H and bits >> rr & 1:
                                rr += 1
                            # vertical run [r0, rr) of this column
                            x0 = gx + c * sc
                            y0 = oy - self.text_ascent() + r0 * sc
                            ring = [(x0, y0), (x0 + sc, y0),
                                    (x0 + sc, y0 + (rr - r0) * sc),
                                    (x0, y0 + (rr - r0) * sc)]
                            dev = self._xf([(px, py, 0.0) for px, py in ring])
                            self._fill_rings_device([dev], col)
                        else:
                            rr += 1

    # ---------------- images ----------------

    def draw_image(self, img: PImage, a, b, c=None, d=None) -> None:
        mode = self.style.image_mode
        if c is None:
            c, d = img.width, img.height
            if mode == CENTER:
                a, b = a - c / 2.0, b - d / 2.0
            x0, y0, x1, y1 = a, b, a + c, b + d
        else:
            x0, y0, x1, y1 = self._mode_corners(a, b, c, d, mode)
        w, h = int(round(x1 - x0)), int(round(y1 - y0))
        if w <= 0 or h <= 0:
            return
        scaled = img.resized(w, h)
        if self.style.tint_on:
            ta, tr, tg, tb = split_argb(self.style.tint_color)
            p = scaled.pix
            na = (((p >> 24) & 0xFF) * ta // 255).astype(np.uint32)
            nr = (((p >> 16) & 0xFF) * tr // 255).astype(np.uint32)
            ng = (((p >> 8) & 0xFF) * tg // 255).astype(np.uint32)
            nb = ((p & 0xFF) * tb // 255).astype(np.uint32)
            scaled = PImage(w, h, (na << 24) | (nr << 16) | (ng << 8) | nb)
        # src-over composite at integer offset (image draws ignore the
        # rotation part of the matrix; translation honored)
        ox = int(round(x0 + self.matrix[0, 3]))
        oy = int(round(y0 + self.matrix[1, 3]))
        dx0, dy0 = max(0, ox), max(0, oy)
        dx1 = min(self.width, ox + w)
        dy1 = min(self.height, oy + h)
        if dx1 <= dx0 or dy1 <= dy0:
            return
        dst = self.pix[dy0:dy1, dx0:dx1]
        src = scaled.pix[dy0 - oy : dy1 - oy, dx0 - ox : dx1 - ox]
        self.pix[dy0:dy1, dx0:dx1] = _blend_arrays(dst, src, self.style.blend_mode)

    def to_image(self) -> PImage:
        return PImage(self.width, self.height, self.pix.copy())

    # ---------------- clip ----------------

    def clip(self, a, b, c, d) -> None:
        x0, y0, x1, y1 = self._mode_corners(a, b, c, d, self.style.image_mode)
        self.clip_rect = (x0, y0, x1, y1)

    def no_clip(self) -> None:
        self.clip_rect = None


# ------------------------------------------------------------- PNG I/O

def encode_png_rgba(img: PImage, chunks: dict | None = None) -> bytes:
    """Deterministic RGBA PNG: color type 6, bit depth 8, filter 0 rows,
    zlib level 9, optional tEXt/zTXt/iTXt chunks (Pencode.java chunk
    map surface), zlib header fixed → byte-stable output."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        raw = ctype + data
        return struct.pack(">I", len(data)) + raw + struct.pack(">I", zlib.crc32(raw))

    a = (img.pix >> 24) & 0xFF
    r = (img.pix >> 16) & 0xFF
    g = (img.pix >> 8) & 0xFF
    b = img.pix & 0xFF
    rgba = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    rows = b"".join(b"\x00" + rgba[y].tobytes() for y in range(img.height))
    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, 6, 0, 0, 0)
    out = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    for ckind in ("tEXt", "zTXt", "iTXt"):
        for entry in (chunks or {}).get(ckind, []):
            kw = str(entry["keyword"]).encode("latin-1")
            txt = str(entry["text"])
            if ckind == "tEXt":
                out.append(chunk(b"tEXt", kw + b"\x00" + txt.encode("latin-1")))
            elif ckind == "zTXt":
                out.append(chunk(b"zTXt", kw + b"\x00\x00" + zlib.compress(txt.encode("latin-1"), 9)))
            else:
                lang = str(entry.get("languageTag", "")).encode("ascii")
                tkw = str(entry.get("translatedKeyword", "")).encode("utf-8")
                comp = bool(entry.get("compressionFlag", False))
                body = txt.encode("utf-8")
                if comp:
                    body = zlib.compress(body, 9)
                out.append(chunk(
                    b"iTXt",
                    kw + b"\x00" + (b"\x01" if comp else b"\x00") + b"\x00"
                    + lang + b"\x00" + tkw + b"\x00" + body,
                ))
    out.append(chunk(b"IDAT", zlib.compress(rows, 9)))
    out.append(chunk(b"IEND", b""))
    return b"".join(out)


def decode_png_image(data: bytes) -> PImage:
    """PNG bytes → PImage via the multimodal decoder (gray/RGB/RGBA)."""
    from warp10_platform_spark.multimodal.media import decode_png

    arr = decode_png(data)  # (H, W) gray or (H, W, C)
    if arr.ndim == 2:
        gray = arr.astype(np.uint32)
        pix = (np.uint32(0xFF) << 24) | (gray << 16) | (gray << 8) | gray
    elif arr.shape[2] == 2:  # gray + alpha
        gray = arr[:, :, 0].astype(np.uint32)
        a = arr[:, :, 1].astype(np.uint32)
        pix = (a << 24) | (gray << 16) | (gray << 8) | gray
    else:
        c = arr.shape[2]
        r = arr[:, :, 0].astype(np.uint32)
        g = arr[:, :, 1].astype(np.uint32)
        b = arr[:, :, 2].astype(np.uint32)
        a = arr[:, :, 3].astype(np.uint32) if c == 4 else np.full_like(r, 255)
        pix = (a << 24) | (r << 16) | (g << 8) | b
    img = PImage(pix.shape[1], pix.shape[0], pix)
    return img
