"""serve_api letterboxing: the model must see an aspect-preserved image
(like the demo path's /8 rounding, reference demo.py:43-45) while all
requests share one canvas shape for the batching executor."""

import numpy as np
from PIL import Image

from sketchedit_tpu.server.letterbox import (
    content_size, letterbox_fit, letterbox_restore)


def _gradient_image(w, h):
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    r = np.broadcast_to(x, (h, w))
    g = np.broadcast_to(y, (h, w))
    b = (r + g) / 2
    return Image.fromarray(np.stack([r, g, b], -1).astype(np.uint8))


def test_content_aspect_preserved():
    # 640x360 (16:9) on a 256 canvas -> 256x144, exactly 16:9
    assert content_size(640, 360, 256) == (256, 144)
    assert content_size(360, 640, 256) == (144, 256)
    assert content_size(64, 64, 256) == (256, 256)
    # extreme aspect must not collapse a side to 0
    w, h = content_size(4096, 8, 256)
    assert w == 256 and h >= 1


def test_letterbox_content_matches_demo_resize():
    """The content region on the canvas must equal the plain
    aspect-preserving resize the demo server performs — i.e. the model
    sees exactly what the demo path would feed it (no squash)."""
    img = _gradient_image(640, 360)
    sk = Image.fromarray(
        (np.eye(360, 640) * 255).astype(np.uint8), mode="L")
    canvas, (w_t, h_t) = 256, content_size(640, 360, 256)
    img_u8, sk_u8, wh = letterbox_fit(img, sk, canvas)
    assert wh == (w_t, h_t)
    assert img_u8.shape == (canvas, canvas, 3)
    assert sk_u8.shape == (canvas, canvas, 1)
    want = np.asarray(img.resize((w_t, h_t)), np.uint8)
    np.testing.assert_array_equal(img_u8[:h_t, :w_t], want)
    # padding: edge-replicate for the image, zero for the sketch
    np.testing.assert_array_equal(
        img_u8[h_t:, :w_t], np.broadcast_to(
            img_u8[h_t - 1:h_t, :w_t], (canvas - h_t, w_t, 3)))
    assert sk_u8[h_t:].max() == 0           # bottom pad (w_t == canvas
    assert sk_u8[:, w_t:].size == 0         # here, so no right pad)


def test_identity_pipeline_roundtrip_is_undistorted():
    """Through an identity 'edit', a smooth non-square image must come
    back geometrically unchanged (the old square-squash path also passed
    output geometry — this pins the full fit->restore chain plus the
    canvas crop being the right region)."""
    img = _gradient_image(640, 360)
    sk = Image.fromarray(np.zeros((360, 640), np.uint8), mode="L")
    img_u8, sk_u8, wh = letterbox_fit(img, sk, 256)
    mask_u8 = np.zeros_like(sk_u8)
    out_img, out_mask = letterbox_restore(img_u8, mask_u8, wh, (640, 360))
    assert out_img.size == (640, 360) and out_mask.size == (640, 360)
    got = np.asarray(out_img, np.float32)
    want = np.asarray(img, np.float32)
    # smooth gradient -> down/up resample loss is tiny; a squash/crop bug
    # would shift the gradient by tens of levels
    assert np.abs(got - want).mean() < 2.0
