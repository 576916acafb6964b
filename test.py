"""Batch-inference CLI — drop-in equivalent of the reference test.py.

Shim: the implementation lives in sketchedit_tpu/cli/infer.py (also
installed as the `sketchedit-test` console script); this file keeps the
reference launch surface (`python test.py --flags`, test_celeb.sh) working
from a plain checkout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sketchedit_tpu.cli.infer import main

if __name__ == '__main__':
    main()
