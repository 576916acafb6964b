"""Demo server + composite pipeline tests (no network, in-process)."""

import base64
import io
import os

import numpy as np
import pytest
from PIL import Image


class FakePipeline:
    """Stands in for the jitted model: returns a shifted image + box mask."""

    def __call__(self, image, sketch):
        composed = np.clip(image * 0.5, -1, 1)
        mask = np.zeros_like(sketch)
        mask[:, 4:-4, 4:-4] = 1.0
        return composed, mask


@pytest.fixture
def app(tmp_path):
    from sketchedit_tpu.server.demo_server import DemoApp
    static = tmp_path / "static"
    (static / "images").mkdir(parents=True)
    img = Image.fromarray(
        (np.random.RandomState(0).rand(64, 48, 3) * 255).astype(np.uint8))
    img.save(static / "images" / "example.png")
    return DemoApp(FakePipeline(), static_root=str(static))


def test_render_lists_example(app):
    html = app.render(0)
    assert "example.png" in html
    assert "canvas" in html


def test_process_image_rounds_to_multiple_of_8(app):
    img = Image.fromarray(
        (np.random.RandomState(1).rand(70, 50, 3) * 255).astype(np.uint8))
    sketch = Image.new("L", (50, 70), 0)
    name = app.process_image(img, sketch, "out.png")
    out = Image.open(os.path.join(app.static_root, "results", name))
    # result resized back to the raw size
    assert out.size == (50, 70)
    # edit chains: result saved back into images/
    assert os.path.exists(os.path.join(app.static_root, "images", name))


def test_post_mask_roundtrip(app):
    # build a canvas-style base64 PNG sketch
    sk = Image.new("RGBA", (48, 64), (0, 0, 0, 0))
    for x in range(10, 30):
        sk.putpixel((x, 20), (0, 0, 255, 255))
    buf = io.BytesIO()
    sk.save(buf, format="PNG")
    data = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()
    redirect = app.handle_post({
        "imgname": ["example.png"], "im_idx": ["0"], "mask": [data]})
    assert redirect.startswith("/?idx=")
    results = os.listdir(os.path.join(app.static_root, "results"))
    assert len(results) == 1 and results[0].startswith("result_")
    masks = os.listdir(os.path.join(app.static_root, "masks"))
    assert len(masks) == 1


def test_concurrent_posts_keep_examples_consistent(app):
    """ThreadingHTTPServer runs handlers concurrently: hammer handle_post
    (example-list insert + version bump) and render from many threads;
    the list must stay bounded/consistent and no thread may crash
    (pins the lock around the shared example list)."""
    import threading

    sk = Image.new("RGBA", (48, 64), (0, 0, 0, 0))
    sk.putpixel((10, 10), (0, 0, 255, 255))
    buf = io.BytesIO()
    sk.save(buf, format="PNG")
    data = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()
    form = {"imgname": ["example.png"], "im_idx": ["0"], "mask": [data]}
    errors = []

    def edit():
        try:
            for _ in range(8):
                app.handle_post(form)
        except Exception as e:       # noqa: BLE001 - recorded for assert
            errors.append(e)

    def browse():
        try:
            for i in range(64):
                app.render(i)
                app.handle_post({"changeim": ["1"], "im_idx": [str(i)]})
        except Exception as e:       # noqa: BLE001
            errors.append(e)

    threads = ([threading.Thread(target=edit) for _ in range(4)]
               + [threading.Thread(target=browse) for _ in range(4)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert len(app.examples) == 1 + 4 * 8       # example.png + every edit
    assert app.version == 4 * 8
    app.render(0)                               # list still renderable


def test_example_list_capped_at_200(app):
    from sketchedit_tpu.server import demo_server
    app.examples = [f"e{i}.png" for i in range(demo_server.MAX_NUM_EXAMPLES)]
    sk = Image.new("RGBA", (48, 64), (0, 0, 0, 0))
    sk.putpixel((5, 5), (0, 0, 255, 255))
    buf = io.BytesIO()
    sk.save(buf, format="PNG")
    data = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()
    # need a real source image named like the head of the list
    img = Image.fromarray(
        (np.random.RandomState(2).rand(64, 48, 3) * 255).astype(np.uint8))
    img.save(os.path.join(app.static_root, "images", "e0.png"))
    app.handle_post({"imgname": ["e0.png"], "im_idx": ["0"], "mask": [data]})
    assert len(app.examples) == demo_server.MAX_NUM_EXAMPLES
    assert app.examples[0].startswith("result_")


def test_change_example_cycles(app):
    redirect = app.handle_post({"changeim": ["1"], "im_idx": ["0"]})
    assert redirect == "/?idx=0"  # single example wraps around


def test_feather_mask_properties():
    from sketchedit_tpu.server.composite import _feather_mask
    m = _feather_mask(64)
    assert m.shape == (64, 64, 1)
    assert float(m[32, 32, 0]) == 1.0
    assert float(m[0, 0, 0]) < 0.05


def test_face_crop_edit_falls_back_without_sketch():
    from sketchedit_tpu.server.composite import face_crop_edit
    image = np.zeros((96, 96, 3), np.float32)
    sketch = np.zeros((96, 96, 1), np.float32)
    out = face_crop_edit(FakePipeline(), image, sketch)
    assert out.shape == (96, 96, 3)
    # fallback edits the whole image through the pipeline (x0.5)
    np.testing.assert_allclose(out, image * 0.5)


def test_face_crop_edit_localizes_sketch_region():
    from sketchedit_tpu.server.composite import face_crop_edit
    rs = np.random.RandomState(0)
    image = (rs.rand(128, 128, 3).astype(np.float32) - 0.5) * 2
    sketch = np.zeros((128, 128, 1), np.float32)
    sketch[30:50, 40:60] = 1.0            # strokes in the upper-left area
    out = face_crop_edit(FakePipeline(), image, sketch)
    assert out.shape == image.shape
    # the sketched region was edited (values halved by FakePipeline)...
    center = out[38:42, 48:52]
    assert np.abs(center).mean() < np.abs(image[38:42, 48:52]).mean()
    # ...while a far corner stays untouched
    np.testing.assert_allclose(out[120:, 120:], image[120:, 120:])


def test_localize_prefers_external_detector():
    from sketchedit_tpu.server.composite import localize_edit_region
    img = np.zeros((64, 64, 3), np.uint8)
    sketch = np.zeros((64, 64, 1), np.float32)
    sketch[10:12, 10:12] = 1.0
    det = lambda im: [(8, 8, 16, 16), (40, 40, 10, 10)]
    box = localize_edit_region(img, sketch, det)
    assert box == (8, 8, 16, 16)


def test_change_example_with_empty_list(tmp_path):
    """Fresh deployment with no examples: 'Next example' must not crash."""
    from sketchedit_tpu.server.demo_server import DemoApp
    app = DemoApp(FakePipeline(), static_root=str(tmp_path / "s"))
    assert app.examples == []
    assert app.handle_post({"changeim": ["1"], "im_idx": ["0"]}) == "/?idx=0"
    assert "canvas" in app.render(0).lower()


def test_process_image_extreme_aspect_ratio(app):
    """A panorama strip must not round a side to zero."""
    img = Image.new("RGB", (2000, 12))
    sketch = Image.new("L", (2000, 12))
    name = app.process_image(img, sketch, "strip.png")
    out = Image.open(os.path.join(app.static_root, "results", name))
    assert out.size == (2000, 12)


def test_post_rejects_path_traversal(app, tmp_path):
    """A client-supplied imgname must not escape static/images: the POST
    read path previously opened ../../any/readable/image and echoed the
    edit back — arbitrary-file exfiltration."""
    secret = tmp_path / "secret.png"
    Image.new("RGB", (16, 16), (1, 2, 3)).save(secret)
    sk = Image.new("RGBA", (16, 16), (0, 0, 0, 0))
    buf = io.BytesIO()
    sk.save(buf, format="PNG")
    data = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()
    with pytest.raises(ValueError, match="escapes"):
        app.handle_post({"imgname": [f"../../{secret.name}"],
                         "im_idx": ["0"], "mask": [data]})
    assert os.listdir(os.path.join(app.static_root, "results")) == []


def test_process_image_floors_at_16px(app):
    """Extreme aspect ratios must floor the /8-rounded side at 16 px —
    an 8-px side yields ZERO 4x4/stride-2 patches at the H/4 feature
    level and the attention kernel divides by the patch count."""
    img = Image.fromarray(
        (np.random.RandomState(2).rand(4, 400, 3) * 255).astype(np.uint8))
    sketch = Image.new("L", (400, 4), 0)
    name = app.process_image(img, sketch, "strip.png")
    out = Image.open(os.path.join(app.static_root, "results", name))
    assert out.size == (400, 4)       # resized back to the raw size


def test_composite_degrades_without_cv2(monkeypatch):
    """cv2=None (the import guard's host) must fall back to the sketch
    bbox + PIL resizes, not crash in skin_mask / cv2.resize."""
    import sketchedit_tpu.server.composite as comp
    import sketchedit_tpu.server.face_localizer as floc
    monkeypatch.setattr(comp, "cv2", None)
    monkeypatch.setattr(floc, "cv2", None)
    assert floc.detect(np.zeros((64, 64, 3), np.uint8)) == []

    image = np.zeros((96, 96, 3), np.float32)
    sketch = np.zeros((96, 96, 1), np.float32)
    sketch[20:31, 24:35] = 1.0
    box = comp.localize_edit_region(
        ((image + 1) / 2 * 255).astype(np.uint8), sketch)
    assert box == (24, 20, 10, 10)    # sketch-bbox fallback, no skin blob

    out = comp.face_crop_edit(FakePipeline(), image, sketch,
                              detector=floc.detect)
    assert out.shape == (96, 96, 3)
    assert np.isfinite(out).all()
