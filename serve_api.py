"""Batch-serving HTTP API shim — implementation in
sketchedit_tpu/cli/serve.py (installed as `sketchedit-serve`); kept at the
root so `python serve_api.py --flags` works from a plain checkout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sketchedit_tpu.cli.serve import main

if __name__ == "__main__":
    main()
