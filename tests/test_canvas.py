"""Processing (P*) tier: exact-coverage rasterizer + script bindings
(io.warp10.script.processing.*, registrations WarpScriptLib.java:
3187-3340)."""

import base64

import numpy as np
import pytest

from warp10_platform_spark.canvas import PCanvas, PImage
from warp10_platform_spark.canvas.core import decode_png_image, encode_png_rgba
from warp10_platform_spark.warpscript.stack import WarpScriptStack


def _st():
    # canvas functions never touch spark — a bare stack works
    return WarpScriptStack(None, None)


def _rgb_count(c, rgb):
    return int(((c.pix & 0xFFFFFF) == rgb).sum())


# ------------------------------------------------------- raster engine

def test_rect_exact_pixel_count():
    c = PCanvas(64, 48)
    c.style.stroke_on = False
    c.style.fill_color = 0xFFFF0000
    c.rect(8, 8, 20, 12)
    assert _rgb_count(c, 0xFF0000) == 20 * 12  # pixel-center rule, integer bounds


def test_ellipse_matches_center_membership():
    c = PCanvas(64, 48)
    c.style.stroke_on = False
    c.style.fill_color = 0xFF0000FF
    c.ellipse(32, 24, 30, 20)  # CENTER mode: rx=15, ry=10
    xs = np.arange(64)[None, :] + 0.5
    ys = np.arange(48)[:, None] + 0.5
    expected = int((((xs - 32.0) / 15.0) ** 2 + ((ys - 24.0) / 10.0) ** 2 <= 1.0).sum())
    assert _rgb_count(c, 0x0000FF) == expected


def test_line_stroke_weight_coverage():
    c = PCanvas(40, 40)
    c.style.stroke_color = 0xFF00FF00
    c.style.stroke_weight = 3.0
    c.line(5, 20, 35, 20)
    xs = np.arange(40)[None, :] + 0.5
    ys = np.arange(40)[:, None] + 0.5
    # distance to segment [(5,20),(35,20)] <= 1.5 with round caps
    t = np.clip((xs - 5.0) / 30.0, 0.0, 1.0)
    cx = 5.0 + t * 30.0
    expected = int(((xs - cx) ** 2 + (ys - 20.0) ** 2 <= 1.5**2).sum())
    assert _rgb_count(c, 0x00FF00) == expected


def test_triangle_and_quad():
    c = PCanvas(40, 40)
    c.style.stroke_on = False
    c.style.fill_color = 0xFFFFFFFF
    c.triangle(0, 0, 39, 0, 0, 39)
    n_tri = _rgb_count(c, 0xFFFFFF)
    assert 700 < n_tri < 800  # half of 40x40 ± the diagonal
    c2 = PCanvas(40, 40)
    c2.style.stroke_on = False
    c2.style.fill_color = 0xFFFFFFFF
    c2.quad(10, 10, 30, 10, 30, 30, 10, 30)
    assert _rgb_count(c2, 0xFFFFFF) == 400


def test_transforms_rotate_translate_push_pop():
    c = PCanvas(64, 64)
    c.style.stroke_on = False
    c.style.fill_color = 0xFFFF00FF
    c.push_matrix()
    c.translate(32, 32)
    c.rotate(np.pi / 4)
    c.rect(-10, -10, 20, 20)
    c.pop_matrix()
    n = _rgb_count(c, 0xFF00FF)
    assert 380 <= n <= 420  # rotated 20x20 square ≈ 400 px
    # matrix restored: a rect at origin lands at origin
    c.rect(0, 0, 4, 4)
    assert (c.pix[0:4, 0:4] & 0xFFFFFF == 0xFF00FF).all()


def test_shape_builder_with_hole():
    c = PCanvas(60, 60)
    c.style.stroke_on = False
    c.style.fill_color = 0xFF123456
    c.begin_shape()
    for x, y in [(5, 5), (55, 5), (55, 55), (5, 55)]:
        c.vertex(x, y)
    c.begin_contour()
    for x, y in [(20, 20), (40, 20), (40, 40), (20, 40)]:
        c.vertex(x, y)
    c.end_contour()
    c.end_shape(close=True)
    assert _rgb_count(c, 0x123456) == 50 * 50 - 20 * 20  # even-odd hole


def test_color_modes_and_lerp():
    c = PCanvas(4, 4)
    assert c.color(255, 0, 0) == 0xFFFF0000
    assert c.color(128) == 0xFF808080
    assert c.color(0, 0, 255, 128) & 0xFF000000 == 0x80000000
    c.style.color_mode = "HSB"
    # hue 0 = red, hue 1/3 = green (max 255 scale → 85)
    assert c.color(0, 255, 255) == 0xFFFF0000
    assert c.color(85, 255, 255) & 0x00FF00 == 0x00FF00
    assert c.lerp_color(0xFF000000, 0xFFFFFFFF, 0.5) == 0xFF7F7F7F
    # channel extraction round trip in HSB
    h = c.channel(0xFFFF0000, "hue")
    assert abs(h) < 1e-9


def test_blend_modes():
    c = PCanvas(4, 4)
    c.background(100)
    c.style.blend_mode = "ADD"
    c.style.stroke_on = False
    c.style.fill_color = 0xFF323232  # +50
    c.rect(0, 0, 4, 4)
    assert (c.pix & 0xFF == 150).all()
    c.style.blend_mode = "MULTIPLY"
    c.style.fill_color = 0xFF808080  # ×128/255
    c.rect(0, 0, 4, 4)
    assert (c.pix & 0xFF == 75).all()  # floor(150*128/255+0.5)


def test_filters():
    c = PCanvas(2, 2)
    c.background(200, 100, 0)
    c.filter("INVERT")
    assert (c.pix & 0xFFFFFF == (55 << 16 | 155 << 8 | 255)).all()
    c.filter("GRAY")
    v = int(c.pix[0, 0]) & 0xFF
    assert v == int(0.30 * 55 + 0.59 * 155 + 0.11 * 255)
    c.filter("THRESHOLD", 0.5)
    assert set(np.unique(c.pix & 0xFF)) <= {0, 255}


def test_pixels_roundtrip_and_resize():
    img = PImage(4, 2)
    img.set_pixels([(-65536 if i % 2 else 255) & 0xFFFFFFFF for i in range(8)])
    assert img.get(1, 0) == 0xFFFF0000
    big = img.resized(8, 4)
    assert big.width == 8 and big.get(2, 0) == 0xFFFF0000
    sub = img.get(0, 0, 2, 2)
    assert sub.width == 2 and sub.height == 2


def test_png_roundtrip_with_text_chunk():
    c = PCanvas(16, 16)
    c.background(10, 200, 30)
    png = encode_png_rgba(c, {"tEXt": [{"keyword": "Title", "text": "t"}]})
    assert b"tEXt" in png and b"Title" in png
    back = decode_png_image(png)
    assert (back.pix == c.pix).all()
    # byte-determinism
    assert png == encode_png_rgba(c, {"tEXt": [{"keyword": "Title", "text": "t"}]})


def test_text_metrics_and_render():
    c = PCanvas(120, 40)
    c.style.fill_color = 0xFF000000
    c.background(255)
    assert c.text_width("abc") == 3 * 6 * (12.0 / 8.0)
    c.text("Hi", 4, 30)
    assert _rgb_count(c, 0x000000) > 10  # glyphs rendered
    c2 = PCanvas(120, 40)
    c2.background(255)
    c2.style.fill_color = 0xFF000000
    c2.text("Hi", 4, 30)
    assert (c.pix == c2.pix).all()  # deterministic


# ------------------------------------------------------- script tier

def test_script_full_chain_and_parse_params():
    st = _st()
    st.exec(
        "64 48 '2D' PGraphics "
        "240 Pbackground PnoStroke 255 0 0 Pfill "
        "8 8 20 12 Prect "  # canvas sits UNDER 4 args: parseParams pops to it
        "0 0 255 Pfill 44 24 20 16 Pellipse"
    )
    pg = st.pop()
    assert isinstance(pg, PCanvas)
    assert _rgb_count(pg, 0xFF0000) == 240


def test_script_color_signed_longs():
    st = _st()
    st.exec("4 4 '2D' PGraphics 255 0 0 Pcolor")
    assert st.pop() == -65536  # Java (long)(int)0xFFFF0000
    st.exec("-65536 Pred")
    assert st.pop() == 255.0
    st.exec("DROP")  # drop the canvas


def test_script_pixels_updatepixels():
    st = _st()
    st.exec("2 2 '2D' PGraphics 0 255 0 Pfill PnoStroke 0 0 2 2 Prect Ppixels")
    pixels = st.pop()
    assert pixels == [-16711936] * 4  # 0xFF00FF00 signed
    st.push([-65536] * 4)
    st.exec("PupdatePixels")
    pg = st.pop()
    assert _rgb_count(pg, 0xFF0000) == 4


def test_script_encode_decode_and_size():
    st = _st()
    st.exec("8 8 '2D' PGraphics 128 Pbackground Pencode")
    url = st.pop()
    assert url.startswith("data:image/png;base64,")
    base64.b64decode(url.split(",", 1)[1])
    st.exec(f"'{url}' Pdecode Psize")
    assert st.pop() == 8 and st.pop() == 8


def test_script_pencode_jpeg_format():
    import numpy as np

    from warp10_platform_spark.multimodal.jpeg import decode_jpeg

    st = _st()
    st.exec("{ 'format' 'jpeg' } 16 16 '2D' PGraphics 128 Pbackground SWAP Pencode")
    url = st.pop()
    assert url.startswith("data:image/jpeg;base64,")
    img = decode_jpeg(base64.b64decode(url.split(",", 1)[1]))
    assert img.shape == (16, 16, 3)
    # flat gray 128 canvas is DC-only → decodes back to exactly 128
    assert int(np.abs(img.astype(int) - 128).max()) == 0


def test_script_math_and_curves():
    st = _st()
    st.exec("4 4 '2D' PGraphics "
            "0.0 0.0 3.0 4.0 Pdist 'd' STORE "
            "5.0 0.0 10.0 0.0 100.0 Pmap 'm' STORE "
            "0.0 100.0 0.25 Plerp 'l' STORE "
            "0.0 50.0 100.0 150.0 0.5 PbezierPoint 'b' STORE")
    st.exec("$d $m $l $b")
    b = st.pop(); lerp = st.pop(); m = st.pop(); d = st.pop()
    assert d == 5.0 and m == 50.0 and lerp == 25.0
    assert b == 75.0  # symmetric control points at t=0.5


def test_script_get_set_copy():
    st = _st()
    st.exec("8 8 '2D' PGraphics 200 0 0 Pfill PnoStroke 0 0 8 8 Prect 3 3 Pget")
    c = st.pop()
    pg = st.pop()
    assert (c & 0xFFFFFF) == 0xC80000
    st.push(pg)
    st.exec("0 0 255 Pset 0 0 Pget")
    v = st.pop()
    assert (v & 0xFFFFFF) == 0x0000FF
    st.pop()


def test_script_style_and_matrix_stack():
    st = _st()
    st.exec(
        "32 32 '2D' PGraphics PnoStroke "
        "PpushStyle 0 0 255 Pfill PpopStyle "  # fill reverts to white
        "0 0 4 4 Prect"
    )
    pg = st.pop()
    assert _rgb_count(pg, 0xFFFFFF) == 16


def test_script_svg_shape():
    st = _st()
    svg = ('<svg width="40" height="40">'
           '<rect x="5" y="5" width="10" height="10" fill="#ff0000"/>'
           '<circle cx="25" cy="25" r="5" fill="red"/></svg>')
    st.exec("40 40 '2D' PGraphics")
    st.push(svg)
    st.exec("PloadShape 0.0 0.0 Pshape")
    pg = st.pop()
    assert _rgb_count(pg, 0xFF0000) >= 100  # the 10x10 rect exactly + circle


def test_script_3d_wireframe():
    st = _st()
    st.exec("48 48 '3D' PGraphics 0 Pstroke 24.0 24.0 0.0 Ptranslate "
            "0.5 ProtateY 0.3 ProtateX 20.0 Pbox")
    pg = st.pop()
    assert _rgb_count(pg, 0x000000) > 40  # edges drawn


def test_3d_perspective_magnifies_near_geometry():
    """The default camera maps z=0 1:1 to pixels; geometry translated
    toward the eye (z>0) must cover MORE pixels."""
    from warp10_platform_spark.canvas.core import PCanvas

    def area(z):
        pg = PCanvas(64, 64, "3D")
        pg.style.stroke_on = False
        pg.style.fill_color = 0xFFFF0000
        pg.translate(32, 32, z)
        pg.begin_shape("QUADS")
        for vx, vy in ((-10, -10), (10, -10), (10, 10), (-10, 10)):
            pg.vertex(vx, vy, 0.0)
        pg.end_shape()
        return int(((pg.pix >> 16) & 0xFF == 0xFF).sum())

    a0, a_near, a_far = area(0.0), area(20.0), area(-20.0)
    assert abs(a0 - 400) <= 42  # ~20x20 at z=0 (1:1 mapping)
    assert a_near > a0 > a_far > 0


def test_3d_zbuffer_occlusion():
    """A nearer face drawn SECOND must overwrite, and a farther face
    drawn second must NOT overwrite — true depth test, not paint order."""
    from warp10_platform_spark.canvas.core import PCanvas

    def draw(first_z, first_col, second_z, second_col):
        pg = PCanvas(32, 32, "3D")
        pg.style.stroke_on = False
        for z, col in ((first_z, first_col), (second_z, second_col)):
            pg.style.fill_color = col
            pg.begin_shape("QUADS")
            for vx, vy in ((6, 6), (26, 6), (26, 26), (6, 26)):
                pg.vertex(vx, vy, z)
            pg.end_shape()
        return int(pg.pix[16, 16])

    # nearer (z=5) drawn second wins
    assert draw(0.0, 0xFF0000FF, 5.0, 0xFF00FF00) == 0xFF00FF00
    # farther (z=-5) drawn second loses — the first fill is kept
    assert draw(0.0, 0xFF0000FF, -5.0, 0xFF00FF00) == 0xFF0000FF


def test_3d_background_clears_depth_buffer():
    """Pbackground must reset the z-buffer: geometry drawn after a
    clear cannot be occluded by pre-clear depth."""
    from warp10_platform_spark.canvas.core import PCanvas

    pg = PCanvas(32, 32, "3D")
    pg.style.stroke_on = False
    pg.style.fill_color = 0xFF0000FF
    pg.begin_shape("QUADS")
    for vx, vy in ((6, 6), (26, 6), (26, 26), (6, 26)):
        pg.vertex(vx, vy, 10.0)  # near
    pg.end_shape()
    pg.background(0)
    pg.style.fill_color = 0xFF00FF00
    pg.begin_shape("QUADS")
    for vx, vy in ((6, 6), (26, 6), (26, 26), (6, 26)):
        pg.vertex(vx, vy, 0.0)  # farther than the pre-clear quad
    pg.end_shape()
    assert int(pg.pix[16, 16]) == 0xFF00FF00


def test_3d_bezier_vertex_and_behind_camera():
    from warp10_platform_spark.canvas.core import PCanvas

    pg = PCanvas(32, 32, "3D")
    pg.begin_shape()
    pg.vertex(2, 2, 0)
    pg.bezier_vertex(10, 2, 10, 10, 2, 10)  # must not crash on 3-tuple verts
    pg.end_shape()

    # a fill entirely behind the camera must draw NOTHING (no phantom)
    pg2 = PCanvas(32, 32, "3D")
    pg2.style.stroke_on = False
    pg2.style.fill_color = 0xFFFF0000
    pg2.translate(16, 16, 2.0 * pg2._eye_z)
    pg2.begin_shape("QUADS")
    for vx, vy in ((-5, -5), (5, -5), (5, 5), (-5, 5)):
        pg2.vertex(vx, vy, 0.0)
    pg2.end_shape()
    assert int(((pg2.pix >> 16) & 0xFF == 0xFF).sum()) == 0


def test_2d_box_wireframe_without_stroke_still_draws():
    """2D Pbox with fill-only (noStroke) keeps the historical
    wireframe-in-fill-color behavior."""
    from warp10_platform_spark.canvas.core import PCanvas

    pg = PCanvas(48, 48, "2D")
    pg.style.stroke_on = False
    pg.style.fill_color = 0xFF123456
    pg.translate(24, 24)
    pg.box(20.0)
    assert int((pg.pix == 0xFF123456).sum()) > 20


def test_3d_filled_box_occludes_back_faces():
    from warp10_platform_spark.canvas.core import PCanvas

    pg = PCanvas(48, 48, "3D")
    pg.style.stroke_on = False
    pg.style.fill_color = 0xFFFFFFFF
    pg.translate(24, 24, 0)
    pg.rotate_y(0.5)
    pg.rotate_x(0.3)
    pg.box(20.0)
    filled = int(((pg.pix >> 24) & 0xFF == 0xFF).sum())
    assert filled > 350  # a solid silhouette, not a wireframe


def test_script_clip_and_blendmode():
    st = _st()
    st.exec("16 16 '2D' PGraphics 0 Pbackground PnoStroke "
            "4 4 8 8 Pclip 255 Pfill 0 0 16 16 Prect PnoClip")
    pg = st.pop()
    assert _rgb_count(pg, 0xFFFFFF) == 64  # only the clip window painted


def test_golden_scene_checksum_stable():
    """Composite scene checksum — pins rendering end-to-end. If an
    intentional engine change shifts this, re-pin deliberately."""
    st = _st()
    st.exec(
        "64 64 '2D' PGraphics 255 Pbackground "
        "2.0 PstrokeWeight 0 0 255 Pstroke 255 200 0 Pfill "
        "8 8 48 30 Prect 32 44 30 20 Pellipse "
        "0 Pfill 'w10' 6.0 60.0 Ptext Pencode"
    )
    url = st.pop()
    data = base64.b64decode(url.split(",", 1)[1])
    img = decode_png_image(data)
    checksum = int(np.bitwise_xor.reduce(img.pix.reshape(-1)))
    again = _st()
    again.exec(
        "64 64 '2D' PGraphics 255 Pbackground "
        "2.0 PstrokeWeight 0 0 255 Pstroke 255 200 0 Pfill "
        "8 8 48 30 Prect 32 44 30 20 Pellipse "
        "0 Pfill 'w10' 6.0 60.0 Ptext Pencode"
    )
    url2 = again.pop()
    assert url == url2
