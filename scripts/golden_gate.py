"""Released-checkpoint golden gate.

The quality north star (BASELINE.md) is <=1e-3 mean L1 (on the [0,1] pixel
scale) between this framework's outputs through the CONVERTED released
checkpoints and the golden result PNGs the reference commits
(/root/reference/datasets/{face_release,general_release}/results/ — written
by the exact denorm of /root/reference/test.py:25-37: (x+1)/2*255, uint8
truncation, cv2 BGR write; our test.py reproduces it).

The released .pth weights are not downloadable in this environment, so the
gate is dormant until someone drops them in:

    checkpoints/celeb/latest_net_M.pth   checkpoints/celeb/latest_net_G.pth
    checkpoints/places/latest_net_M.pth  checkpoints/places/latest_net_G.pth

(.npz converted equivalents work too — params/checkpoint.py ingests either.)
Then:

    python scripts/golden_gate.py            # both sets, exits nonzero on fail
    python scripts/golden_gate.py --set celeb --tol 1e-3

The opt-in test tests/test_golden_release.py runs the same gate under
pytest and skips itself while the checkpoints are absent.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETS = {
    "celeb": "face_release",
    "places": "general_release",
}


def golden_root(dataset: str) -> str | None:
    """Authoritative golden dir: the reference checkout when present, else
    env override, else the staged copy (which test_celeb.sh may overwrite —
    warn in that case)."""
    for root, warn in (
            (os.environ.get("SKETCHEDIT_GOLDEN_ROOT") or "", False),
            ("/root/reference/datasets", False),
            (os.path.join(REPO, "datasets"), True)):
        d = os.path.join(root, dataset, "results") if root else ""
        if d and os.path.isdir(d) and os.listdir(d):
            if warn:
                print(f"WARNING: using staged goldens at {d} — these are "
                      f"overwritten by test_{'{celeb,places}'}.sh runs; "
                      f"prefer SKETCHEDIT_GOLDEN_ROOT")
            return d
    return None


def checkpoints_present(name: str) -> bool:
    ckdir = os.path.join(REPO, "checkpoints", name)
    def has(label):
        return any(os.path.exists(os.path.join(ckdir, f"latest_net_{label}{ext}"))
                   for ext in (".pth", ".npz"))
    return has("M") and has("G")


def run_set(name: str, tol: float) -> dict:
    """Run the launch-script flow for one released set; return the report."""
    import numpy as np
    from PIL import Image

    dataset = SETS[name]
    gold = golden_root(dataset)
    if gold is None:
        return {"set": name, "status": "error",
                "reason": f"no golden results dir for {dataset}"}
    if not checkpoints_present(name):
        return {"set": name, "status": "blocked",
                "reason": f"checkpoints/{name}/latest_net_{{M,G}}.pth absent"}

    with tempfile.TemporaryDirectory() as out_dir:
        cmd = [
            sys.executable, os.path.join(REPO, "test.py"),
            "--batchSize", "1", "--nThreads", "1", "--name", name,
            "--joint_train_inp", "--dataset_mode", "testimage",
            "--image_dirs", f"./datasets/{dataset}/images",
            "--mask_dirs", f"./datasets/{dataset}/edges",
            "--image_lists", f"./datasets/{dataset}/list.txt",
            "--image_postfix", ".png", "--mask_postfix", ".png",
            "--model", "editline2", "--netG", "deepfillc2",
            "--pool_type", "max", "--use_cam", "--which_epoch", "latest",
            "--output_dir", out_dir,
        ]
        res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                             timeout=3600)
        if res.returncode != 0:
            return {"set": name, "status": "error",
                    "reason": res.stderr[-2000:]}

        per_image = {}
        for fn in sorted(os.listdir(gold)):
            got_path = os.path.join(out_dir, fn)
            if not os.path.exists(got_path):
                per_image[fn] = None
                continue
            want = np.asarray(Image.open(os.path.join(gold, fn)).convert(
                "RGB"), np.float32) / 255.0
            got = np.asarray(Image.open(got_path).convert("RGB"),
                             np.float32) / 255.0
            per_image[fn] = float(np.abs(got - want).mean())

    missing = [k for k, v in per_image.items() if v is None]
    worst = max((v for v in per_image.values() if v is not None),
                default=float("inf"))
    ok = not missing and worst <= tol
    return {"set": name, "status": "pass" if ok else "fail",
            "worst_l1": worst, "tol": tol, "per_image": per_image,
            "missing": missing}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", choices=list(SETS), default=None,
                    help="one released set (default: both)")
    ap.add_argument("--tol", type=float, default=1e-3,
                    help="mean-L1 gate on the [0,1] pixel scale")
    args = ap.parse_args()

    names = [args.set] if args.set else list(SETS)
    any_fail = False
    any_ran = False
    for name in names:
        rep = run_set(name, args.tol)
        if rep["status"] == "blocked":
            print(f"[{name}] BLOCKED: {rep['reason']}")
            continue
        if rep["status"] == "error":
            print(f"[{name}] ERROR: {rep['reason']}")
            any_fail = True
            continue
        any_ran = True
        print(f"[{name}] {rep['status'].upper()}  worst mean-L1 "
              f"{rep['worst_l1']:.2e} (tol {rep['tol']:.0e})")
        for fn, l1 in rep["per_image"].items():
            print(f"    {fn}: {'MISSING' if l1 is None else f'{l1:.2e}'}")
        any_fail |= rep["status"] != "pass"

    if not any_ran and not any_fail:
        print("golden gate dormant: drop the released checkpoints into "
              "checkpoints/{celeb,places}/ to arm it")
        return 0
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
