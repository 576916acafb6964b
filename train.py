"""Training CLI shim — implementation in sketchedit_tpu/cli/train.py
(installed as `sketchedit-train`); kept at the root so
`python train.py --flags` works from a plain checkout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sketchedit_tpu.cli.train import main

if __name__ == "__main__":
    main()
