"""image_folder: recursive discovery, files.list cache round-trip
(--cache_filelist_read/write wiring), and the generic ImageFolder
dataset. Reference: data/image_folder.py:21-93."""

import os

import numpy as np
from PIL import Image

from sketchedit_tpu.data.image_folder import (
    ImageFolder, is_image_file, make_dataset)


def _stage(tmp_path):
    (tmp_path / "sub").mkdir()
    rs = np.random.RandomState(0)
    for name in ("b.png", "a.jpg", "sub/c.png", "notes.txt"):
        p = tmp_path / name
        if name.endswith(".txt"):
            p.write_text("not an image")
        else:
            Image.fromarray(
                (rs.rand(8, 8, 3) * 255).astype(np.uint8)).save(p)
    return tmp_path


def test_make_dataset_recursive_sorted_and_capped(tmp_path):
    _stage(tmp_path)
    imgs = make_dataset(str(tmp_path))
    names = [os.path.relpath(p, tmp_path) for p in imgs]
    assert names == ["a.jpg", "b.png", os.path.join("sub", "c.png")]
    assert not is_image_file("notes.txt")
    assert make_dataset(str(tmp_path), recursive=False) == imgs[:2]
    assert make_dataset(str(tmp_path), max_dataset_size=1) == imgs[:1]


def test_make_dataset_cache_roundtrip(tmp_path):
    _stage(tmp_path)
    full = make_dataset(str(tmp_path), write_cache=True)
    cache = tmp_path / "files.list"
    assert cache.is_file()
    # cached read wins over the walk: remove a file on disk, the cache
    # still returns it (the reference's files.list semantics)
    os.remove(full[0])
    assert make_dataset(str(tmp_path), read_cache=True) == full
    assert make_dataset(
        str(tmp_path), read_cache=True, max_dataset_size=2) == full[:2]
    # without read_cache the walk reflects the deletion
    assert make_dataset(str(tmp_path)) == full[1:]


def test_image_folder_dataset(tmp_path):
    _stage(tmp_path)
    ds = ImageFolder(str(tmp_path), return_paths=True)
    assert len(ds) == 3
    img, path = ds[0]
    assert img.size == (8, 8) and path.endswith("a.jpg")
