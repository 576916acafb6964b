"""Interactive demo CLI shim — implementation in sketchedit_tpu/cli/demo.py
(installed as `sketchedit-demo`); kept at the root so
`python demo.py --flags` works from a plain checkout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sketchedit_tpu.cli.demo import main

if __name__ == "__main__":
    main()
