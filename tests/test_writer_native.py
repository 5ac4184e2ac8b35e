"""Async image writer + native-build plumbing tests."""
import os.path as osp

import numpy as np

from warpedganspace_tpu.native import load_native
from warpedganspace_tpu.traverse.writer import AsyncImageWriter


def test_async_writer_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    with AsyncImageWriter(workers=2, max_inflight=4) as w:
        for i in range(10):
            img = rng.rand(16, 16, 3).astype(np.float32) * 2 - 1
            path = str(tmp_path / f"{i:06d}.jpg")
            w.submit(img, path, quality=90)
            paths.append(path)
        w.flush()
    import cv2

    for p in paths:
        assert osp.isfile(p)
        loaded = cv2.imread(p)
        assert loaded is not None and loaded.shape == (16, 16, 3)


def test_async_writer_resize(tmp_path):
    img = np.zeros((8, 8, 1), dtype=np.float32)
    with AsyncImageWriter(workers=1) as w:
        w.submit(img, str(tmp_path / "a.jpg"), img_size=32, quality=75)
    import cv2

    assert cv2.imread(str(tmp_path / "a.jpg")).shape[:2] == (32, 32)


def test_native_build_caches():
    lib1 = load_native()
    lib2 = load_native()
    if lib1 is None:
        import pytest

        pytest.skip("no toolchain")
    assert lib1 is lib2  # cached handle
