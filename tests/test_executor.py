"""Dynamic-batching executor tests."""

import threading
import time

import numpy as np

from sketchedit_tpu.server.executor import BatchingExecutor, _bucket


class RecordingPipeline:
    def __init__(self):
        self.batch_sizes = []
        self.lock = threading.Lock()

    def __call__(self, images, sketches):
        with self.lock:
            self.batch_sizes.append(images.shape[0])
        time.sleep(0.01)
        return images * 2, sketches


def test_bucket_rounding():
    assert _bucket(1, 64) == 1
    assert _bucket(3, 64) == 8     # coarse buckets: 1, 8, 32, 128
    assert _bucket(33, 64) == 64
    assert _bucket(200, 64) == 64


def test_executor_coalesces_and_scatters():
    pipe = RecordingPipeline()
    ex = BatchingExecutor(pipe, max_batch=8, max_wait_ms=30)
    try:
        imgs = [np.full((4, 4, 3), i, np.float32) for i in range(6)]
        sks = [np.zeros((4, 4, 1), np.float32) for _ in range(6)]
        futs = [ex.submit(i, s) for i, s in zip(imgs, sks)]
        results = [f.result(timeout=10) for f in futs]
        # every caller got ITS image back (x2)
        for i, (comp, _mask) in enumerate(results):
            np.testing.assert_array_equal(comp, imgs[i] * 2)
        # requests were coalesced into fewer device calls than requests
        assert sum(pipe.batch_sizes) >= 6
        assert len(pipe.batch_sizes) < 6
    finally:
        ex.shutdown()


def test_executor_separates_mixed_sizes():
    pipe = RecordingPipeline()
    ex = BatchingExecutor(pipe, max_batch=8, max_wait_ms=20)
    try:
        f1 = ex.submit(np.zeros((4, 4, 3), np.float32),
                       np.zeros((4, 4, 1), np.float32))
        f2 = ex.submit(np.zeros((8, 8, 3), np.float32),
                       np.zeros((8, 8, 1), np.float32))
        c1, _ = f1.result(timeout=10)
        c2, _ = f2.result(timeout=10)
        assert c1.shape == (4, 4, 3)
        assert c2.shape == (8, 8, 3)
    finally:
        ex.shutdown()
