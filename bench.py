"""Benchmark: steady-state edit throughput at batch 32, 256x256.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no benchmark numbers
(BASELINE.md). The north star is >=10x the reference's GPU throughput at
batch 32 / 256^2. We take 15 images/sec as the estimated reference
single-GPU throughput for this 7.5M-param, 76-conv + quadratic-attention
model (DeepFill-family models measure in the tens of images/sec on V100 at
256^2), so the 10x target corresponds to vs_baseline >= 10.0 with
BASELINE_IMAGES_PER_SEC = 15.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMAGES_PER_SEC = 15.0
# Train baseline derived from the same assumption: a G+D training step is
# ~3x the inference FLOPs (G fwd+bwd, regenerated fakes, D fwd+bwd), so
# the estimated reference GPU G+D rate is 15/3 = 5 img/s. Keeps the train
# vs_baseline meaningful instead of comparing a train rate to an
# inference baseline.
TRAIN_BASELINE_IMAGES_PER_SEC = 5.0

BATCH = int(os.environ.get("BENCH_BATCH", 32))
SIZE = int(os.environ.get("BENCH_SIZE", 256))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
ATTENTION = os.environ.get("BENCH_ATTENTION", "pallas")
WARMUP = 3
ITERS = int(os.environ.get("BENCH_ITERS", 20))


def main():
    import numpy as np
    import jax

    from sketchedit_tpu.runner import enable_persistent_cache
    from sketchedit_tpu.models import editline2
    from sketchedit_tpu.models.editline2 import EditLine2Config
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig

    enable_persistent_cache()

    config = EditLine2Config(
        netg=DeepFillConfig(attention_impl=ATTENTION),
        precision=None,          # backend-default precision (bf16 MXU passes)
        compute_dtype=DTYPE,
    )
    rs = np.random.RandomState(0)
    use_u8 = os.environ.get("BENCH_U8", "0") == "1"
    mode = os.environ.get("BENCH_MODE", "stream")
    jnp = jax.numpy

    if mode != "train":
        # inference-only setup: the train branch builds its own state and
        # batch, so doing these uploads unconditionally would push ~MBs of
        # unused arrays through the tunnel (~45ms fixed per transfer)
        # before every train bench
        params = editline2.init_params(jax.random.PRNGKey(0))
        if use_u8:
            image = jax.numpy.asarray(
                (rs.rand(BATCH, SIZE, SIZE, 3) * 255).astype(np.uint8))
            sketch = jax.numpy.asarray(
                ((rs.rand(BATCH, SIZE, SIZE, 1) > 0.95) * 255)
                .astype(np.uint8))
            fn = jax.jit(
                lambda p, i, s: editline2.edit_u8(p, i, s, config=config))
        else:
            image = jax.numpy.asarray(
                rs.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
            sketch = jax.numpy.asarray(
                (rs.rand(BATCH, SIZE, SIZE, 1) > 0.95).astype(np.float32))
            fn = jax.jit(
                lambda p, i, s: editline2.edit(p, i, s, config=config))

    def checksum(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    if mode == "train":
        # Training throughput: one jitted G+D step per batch. Every step
        # fetches a loss scalar, which forces execution on this runtime.
        from sketchedit_tpu.train.trainer import (
            TrainConfig, init_train_state, train_step)
        tcfg = TrainConfig(netg=DeepFillConfig(attention_impl=ATTENTION),
                           compute_dtype=DTYPE,
                           reuse_fake=os.environ.get(
                               "BENCH_REUSE_FAKE", "0") == "1",
                           remat=os.environ.get("BENCH_REMAT", "0") == "1")
        state = init_train_state(jax.random.PRNGKey(0), tcfg)
        batch = {
            "image": jnp.asarray(
                rs.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)),
            "gt": jnp.asarray(
                rs.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)),
            "mask": jnp.asarray(
                (rs.rand(BATCH, SIZE, SIZE, 1) > 0.95).astype(np.float32)),
            "edgegt": jnp.asarray(
                (rs.rand(BATCH, SIZE, SIZE, 1) > 0.95).astype(np.float32)),
            "random_mask": jnp.asarray(
                (rs.rand(BATCH, SIZE, SIZE, 1) > 0.7).astype(np.float32)),
            "random_mask2": jnp.asarray(
                (rs.rand(BATCH, SIZE, SIZE, 1) > 0.7).astype(np.float32)),
        }
        step = jax.jit(lambda st, b, k: train_step(st, b, k, tcfg),
                       donate_argnums=(0,))
        key = jax.random.PRNGKey(1)
        for _ in range(WARMUP):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            float(metrics["G_total"])
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                key, sub = jax.random.split(key)
                state, metrics = step(state, batch, sub)
            total = float(metrics["G_total"])     # forces the whole chain
            dt = min(dt, time.perf_counter() - t0)
            assert np.isfinite(total)
        dt = max(dt, 1e-9)
        images_per_sec = BATCH * ITERS / dt
        print(json.dumps({
            "metric": f"train images/sec/chip, {SIZE}x{SIZE} G+D step, "
                      f"batch {BATCH}, {DTYPE}, attention={ATTENTION}",
            "value": round(images_per_sec, 2),
            "unit": "images/sec",
            "vs_baseline": round(
                images_per_sec / TRAIN_BASELINE_IMAGES_PER_SEC, 2),
            "baseline_images_per_sec": TRAIN_BASELINE_IMAGES_PER_SEC,
        }))
        return

    if mode == "chain":
        # Latency mode: output feeds the next input, every step on the
        # critical path; the final scalar fetch forces completion (on this
        # runtime block_until_ready alone does not guarantee execution).
        def run(image, n):
            composed = image
            for _ in range(n):
                composed, _mask = fn(params, image, sketch)
                if use_u8:
                    image = composed
                else:
                    image = jnp.clip(composed, -1, 1).astype(image.dtype)
            return checksum(composed)

        run(image, WARMUP)
        # best-of-3: the tunneled device shows transient multi-second
        # stalls (lock churn after other workloads); the best repetition is
        # the honest steady-state number and still forces full execution.
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(image, ITERS)
            dt = min(dt, time.perf_counter() - t0)
    else:
        # Streaming (serving) mode: independent batches with distinct
        # inputs; dispatch overlaps with device compute. Every output is
        # reduced on device and ALL checksums are fetched, so each batch's
        # execution is provably forced — no result can be elided.
        if use_u8:
            images = [jnp.asarray(
                (rs.rand(BATCH, SIZE, SIZE, 3) * 255).astype(np.uint8))
                for _ in range(ITERS)]
        else:
            images = [jnp.asarray(
                rs.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
                for _ in range(ITERS)]
        for _ in range(WARMUP):
            checksum(fn(params, images[0], sketch)[0])
        # best-of-3 repetitions (see chain mode note)
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sums = [jnp.sum(fn(params, im, sketch)[0].astype(jnp.float32))
                    for im in images]
            total = float(jnp.stack(sums).sum())
            dt = min(dt, time.perf_counter() - t0)
            assert np.isfinite(total)
    dt = max(dt, 1e-9)

    images_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": f"images/sec/chip, {SIZE}x{SIZE} edit, batch {BATCH}, "
                  f"{DTYPE}, attention={ATTENTION}, {mode}"
                  + (", u8-io" if use_u8 else ""),
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
        "baseline_images_per_sec": BASELINE_IMAGES_PER_SEC,
    }))


if __name__ == "__main__":
    # Hang watchdog: a lost terminal-server session grant makes backend
    # init block FOREVER inside make_c_api_client (observed r3: >2h wedge
    # after processes died mid-tunnel-call; claim_timeout is -1 and not
    # honored during a dead handshake). An unattended driver run must
    # fail loudly instead of hanging, so exit nonzero with a diagnosis if
    # no JSON line has been produced by the deadline. Overridable for
    # legitimately slow fresh compiles (remote-compile variance is up to
    # ~20 min): BENCH_WATCHDOG_S, default 2400.
    # BENCH_WATCHDOG_S=0 disables (same contract as SERVE_WARMUP_WATCHDOG_S).
    import threading
    _watchdog_s = float(os.environ.get("BENCH_WATCHDOG_S", 2400))

    def _hang_abort():
        print("bench watchdog: no result after "
              f"{_watchdog_s:.0f}s — backend init or device call is "
              "hung (wedged tunnel session grant?); aborting",
              file=sys.stderr, flush=True)
        os._exit(3)

    def _arm():
        if _watchdog_s <= 0:
            return None
        t = threading.Timer(_watchdog_s, _hang_abort)
        t.daemon = True
        t.start()
        return t

    # the tunneled TPU occasionally wedges transiently (device-lock churn);
    # one retry after a cool-down keeps the recorded benchmark honest
    # without masking real failures. Each attempt gets its own full
    # watchdog budget: a timer spanning attempt 1 + sleep + attempt 2 would
    # abort the retry mid-compile (killing the async persistent-cache
    # write with it).
    _wd = _arm()
    try:
        main()
    except Exception as e:
        import traceback
        print(f"bench attempt 1 failed ({e}); retrying in 60s",
              file=sys.stderr)
        traceback.print_exc()
        if _wd is not None:
            _wd.cancel()
        time.sleep(60)
        _wd = _arm()
        main()
    if _wd is not None:
        _wd.cancel()
