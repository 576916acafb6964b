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


def test_executor_mixed_size_herd():
    """Many threads submitting several spatial sizes concurrently: every
    caller gets its own result back, no deadlock with the bounded queue."""
    pipe = RecordingPipeline()
    ex = BatchingExecutor(pipe, max_batch=8, max_wait_ms=5, max_queue=16)
    sizes = [4, 8, 16]
    n_threads, per_thread = 12, 5
    results = {}
    errors = []

    def worker(tid):
        rs = np.random.RandomState(tid)
        try:
            for j in range(per_thread):
                s = sizes[rs.randint(len(sizes))]
                img = np.full((s, s, 3), tid * 100 + j, np.float32)
                fut = ex.submit(img, np.zeros((s, s, 1), np.float32))
                comp, _ = fut.result(timeout=30)
                results[(tid, j)] = (img, comp)
        except Exception as e:          # pragma: no cover
            errors.append(e)

    try:
        threads = [threading.Thread(target=worker, args=(t,))
                   for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        assert len(results) == n_threads * per_thread
        for img, comp in results.values():
            np.testing.assert_array_equal(comp, img * 2)
    finally:
        ex.shutdown()


def test_executor_bounded_queue_backpressure():
    """A full queue raises queue.Full at submit instead of growing."""
    import queue as _queue
    import pytest

    class Blocking:
        def __call__(self, images, sketches):
            time.sleep(2.0)
            return images, sketches

    ex = BatchingExecutor(Blocking(), max_batch=1, max_wait_ms=1, max_queue=2)
    # monkeypatch the submit timeout via direct put to keep the test fast
    try:
        img = np.zeros((4, 4, 3), np.float32)
        sk = np.zeros((4, 4, 1), np.float32)
        ex.submit(img, sk)
        from concurrent.futures import Future
        with pytest.raises(_queue.Full):
            for _ in range(8):
                ex._q.put((img, sk, Future()), timeout=0.05)
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


def test_shutdown_fails_parked_and_queued_requests():
    """shutdown() must resolve every future it will never serve: one parked
    in _pending (size-mismatch carry) and one still in the queue."""
    from concurrent.futures import Future

    pipe = RecordingPipeline()
    ex = BatchingExecutor(pipe, max_batch=8, max_wait_ms=10)
    ex.shutdown()                      # stop the dispatcher first so the
    parked, queued = Future(), Future()  # injected items stay unserved
    img = np.zeros((4, 4, 3), np.float32)
    sk = np.zeros((4, 4, 1), np.float32)
    ex._pending = (img, sk, parked)
    ex._q.put((img, sk, queued))
    ex.shutdown()
    for fut in (parked, queued):
        try:
            fut.result(timeout=1)
            raise AssertionError("future should have failed")
        except RuntimeError as e:
            assert "shut down" in str(e)


def test_malformed_request_fails_only_its_batch():
    """Two requests with matching image shapes but unstackable sketch
    shapes (the mismatch _collect's image-only check can't see) must error
    their own futures, not kill the dispatcher: later well-formed requests
    still succeed."""
    pipe = RecordingPipeline()
    ex = BatchingExecutor(pipe, max_batch=8, max_wait_ms=100)
    try:
        img = np.zeros((4, 4, 3), np.float32)
        f1 = ex.submit(img, np.zeros((4, 4, 1), np.float32))
        f2 = ex.submit(img, np.zeros((5, 5, 1), np.float32))
        failed = 0
        for f in (f1, f2):
            try:
                f.result(timeout=10)
            except ValueError:
                failed += 1
        assert failed >= 1                 # the batch that mixed them died
        good = ex.submit(img, np.zeros((4, 4, 1), np.float32))
        comp, _ = good.result(timeout=10)
        np.testing.assert_array_equal(comp, img * 2)
    finally:
        ex.shutdown()


def test_cancelled_future_does_not_poison_batch():
    """cancel() on one request must not discard its batchmates' results."""
    import threading as _t

    release = _t.Event()

    class GatedPipeline(RecordingPipeline):
        def __call__(self, images, sketches):
            release.wait(timeout=10)
            return super().__call__(images, sketches)

    ex = BatchingExecutor(GatedPipeline(), max_batch=8, max_wait_ms=10)
    try:
        imgs = [np.full((4, 4, 3), i, np.float32) for i in range(3)]
        sk = np.zeros((4, 4, 1), np.float32)
        futs = [ex.submit(i, sk) for i in imgs]
        futs[1].cancel()                  # give up while batch is gated
        release.set()
        for i in (0, 2):
            comp, _ = futs[i].result(timeout=10)
            np.testing.assert_array_equal(comp, imgs[i] * 2)
    finally:
        ex.shutdown()


def test_submit_after_shutdown_raises():
    ex = BatchingExecutor(RecordingPipeline(), max_batch=8, max_wait_ms=10)
    ex.shutdown()
    img = np.zeros((4, 4, 3), np.float32)
    try:
        ex.submit(img, np.zeros((4, 4, 1), np.float32))
        raise AssertionError("submit after shutdown should raise")
    except RuntimeError:
        pass
