"""Model registry.

The reference resolves "--model editline2" / "--netG deepfillc2" / "MD"
strings reflectively (models/__init__.py:5-39, models/networks/
__init__.py:41-43, util/util.py:175-187). We keep the same *name
vocabulary* as explicit registries so released scripts and configs keep
working, without the import-by-reflection machinery.
"""

from sketchedit_tpu.models import md_generator, deepfill_c2, editline2
from sketchedit_tpu.models.editline2 import EditLine2Config
from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig

# --netG name -> (init_params, apply) pairs; case-insensitive like the
# reference's find_class_in_module.
GENERATORS = {
    "deepfillc2": deepfill_c2,
    "md": md_generator,
}

MODELS = {
    "editline2": editline2,
}


def get_generator(name: str):
    try:
        return GENERATORS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown netG '{name}'; available: {sorted(GENERATORS)}")


def get_model(name: str):
    try:
        return MODELS[name.lower().replace('_', '')]
    except KeyError:
        raise ValueError(
            f"unknown model '{name}'; available: {sorted(MODELS)}")
