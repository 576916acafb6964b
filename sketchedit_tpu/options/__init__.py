import sys

from sketchedit_tpu.options.base_options import BaseOptions
from sketchedit_tpu.options.test_options import TestOptions
from sketchedit_tpu.options.train_options import TrainOptions


def parse_argv(options_cls, argv, **parse_kwargs):
    """Parse an explicit argv list through an Options class.

    The options classes read sys.argv directly (reference CLI contract),
    so scripts that build flag lists programmatically must swap it; this
    helper owns the swap under try/finally so a parse error can't leave
    sys.argv replaced for the rest of the process. ``argv`` is the
    argument list WITHOUT the program name.
    """
    saved = sys.argv
    sys.argv = ["prog", *argv]
    try:
        return options_cls().parse(**parse_kwargs)
    finally:
        sys.argv = saved
