"""Standalone editimage-loader capacity measurement (no device).

Measures steady-state images/sec through the full host pipeline the
trainer consumes — DataLoader(compact=True) + packed_transfer.pack_batch —
at 256^2 and 512^2, with the decode cache cold (epoch 1) and warm.
Emits one JSON blob; REAL_TRAIN_r4.json embeds it next to the measured
device rates (VERDICT r3 item 2: capacity must be >=2x the 26.6 img/s
512^2 device rate on this host).

    python scripts/loader_capacity.py [--out LOADER_CAPACITY_r4.json]
"""

import argparse
import json
import os
import sys
import time

# unconditional, not setdefault: the shell exports JAX_PLATFORMS=axon,
# so setdefault was a dead guard. Nothing in the measured path touches
# jax today, but if a future loader/pack change does, it must land on
# CPU, never initialize the tunneled TPU mid-measurement. (If jax ever
# gets imported here, also call jax.config.update("jax_platforms",
# "cpu") — the axon plugin re-registers itself over the env var alone.)
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def measure(img_dir, load, crop, batch, *, epochs=3, cache_mb=512,
            workers=1):
    from sketchedit_tpu.data import DataLoader
    from sketchedit_tpu.data.editimage import EditImageDataset
    from sketchedit_tpu.data.packed_transfer import pack_batch
    opt = argparse.Namespace(
        train_image_dir=img_dir, train_image_list=None,
        canny_low=100, canny_high=200, preprocess_mode='resize_and_crop',
        load_size=load, crop_size=crop, no_flip=False, isTrain=True,
        not_om=True, cache_filelist_read=False, cache_filelist_write=False,
        max_dataset_size=None, decode_cache_mb=cache_mb)
    ds = EditImageDataset()
    ds.initialize(opt)
    dl = DataLoader(ds, batch_size=batch, shuffle=True, num_workers=workers,
                    drop_last=True, compact=True)

    def one_epoch():
        n = 0
        t0 = time.perf_counter()
        for b in dl:
            pack_batch({k: v for k, v in b.items()
                        if k not in ('path', 'valid')})
            n += b['valid']
        return n / (time.perf_counter() - t0)

    cold = one_epoch()                      # decode cache filling
    warm = [one_epoch() for _ in range(epochs)]
    dl.close()
    return {"cold_img_s": round(cold, 1),
            "warm_img_s": round(float(np.mean(warm)), 1),
            "warm_epochs": [round(w, 1) for w in warm],
            "cache_mb_used": round(ds._cache_bytes / 2**20, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--cache_mb", type=int, default=512)
    ap.add_argument("--workdir", default="/tmp/loader_capacity")
    args = ap.parse_args()

    from scripts.stage_train_images import stage
    results = {"host_cpus": os.cpu_count(),
               "what": "editimage loader + pack_batch standalone capacity "
                       "(no device), stage_train_images fixtures"}
    for size, batch in ((256, 16), (512, 8)):
        d = os.path.join(args.workdir, f"imgs{size}")
        os.makedirs(d, exist_ok=True)
        if len(os.listdir(d)) < args.images:
            stage(d, args.images, size)
        key = f"{size}x{size}_b{batch}"
        results[key] = measure(d, size, size, batch,
                               cache_mb=args.cache_mb)
        results[key + "_nocache"] = measure(d, size, size, batch, cache_mb=0)
        print(key, results[key], "| nocache", results[key + "_nocache"])

    blob = json.dumps(results, indent=1)
    print(blob)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob + "\n")


if __name__ == "__main__":
    main()
