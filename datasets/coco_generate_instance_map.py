"""Generate instance-index PNG maps from COCO polygon annotations.

Offline dataset-prep equivalent of the reference's COCO helper
(datasets/coco_generate_instance_map.py): for each image, rasterize its
annotation polygons into a single-channel PNG where pixels of instance i
hold value i (0 = background). Polygons are rasterized directly with
OpenCV, so pycocotools is optional (used only for RLE-encoded masks when
available).

Usage:
    python datasets/coco_generate_instance_map.py \
        --annotation_file instances_train2017.json \
        --output_dir train_inst/
"""

import argparse
import json
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def rasterize_instances(anns, height, width):
    """Polygon annotations -> (H, W) uint8/16 instance-index map."""
    inst = np.zeros((height, width), np.int32)
    for idx, ann in enumerate(anns, start=1):
        seg = ann.get("segmentation")
        if isinstance(seg, list):           # polygon(s)
            for poly in seg:
                pts = np.asarray(poly, np.float64).reshape(-1, 2)
                cv2.fillPoly(inst, [pts.astype(np.int32)], int(idx))
        elif isinstance(seg, dict):         # RLE
            try:
                from pycocotools import mask as mask_utils
            except ImportError:
                print(f"skipping RLE annotation {ann.get('id')}: "
                      "pycocotools unavailable")
                continue
            rle = seg
            if isinstance(seg.get("counts"), list):
                # crowd annotations (iscrowd=1) ship UNCOMPRESSED RLE
                # with counts as a plain list; decode() needs the
                # compressed form
                rle = mask_utils.frPyObjects(seg, height, width)
            m = mask_utils.decode(rle)
            inst[m > 0] = idx
    dtype = np.uint8 if inst.max() < 256 else np.uint16
    return inst.astype(dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotation_file", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--train_img_dir", default=None,
                    help="unused; kept for script compatibility")
    args = ap.parse_args()
    if cv2 is None:
        # fail at startup with a clear message, not mid-run on the first
        # polygon annotation with an AttributeError on None
        raise SystemExit("opencv-python is required to rasterize polygon "
                         "annotations (import cv2 failed)")
    os.makedirs(args.output_dir, exist_ok=True)

    with open(args.annotation_file) as f:
        coco = json.load(f)
    anns_by_image = {}
    for ann in coco["annotations"]:
        anns_by_image.setdefault(ann["image_id"], []).append(ann)

    from PIL import Image
    for img in coco["images"]:
        anns = anns_by_image.get(img["id"], [])
        inst = rasterize_instances(anns, img["height"], img["width"])
        name = os.path.splitext(img["file_name"])[0] + ".png"
        Image.fromarray(inst).save(os.path.join(args.output_dir, name))
        print(f"{name}: {len(anns)} instances")


if __name__ == "__main__":
    main()
