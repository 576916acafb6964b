"""sketchedit_tpu — a TPU-native reimplementation of SketchEdit (CVPR 2022).

Sketch-guided local image editing: given an RGB image and a partial sketch,
predict a soft edit-region mask (netM), encode the region's original content
into a global latent, and synthesize the edited region with a two-stage
gated-convolution generator with contextual attention (netG).

Reference behavior: zengxianyu/sketchedit (PyTorch). This package is a
from-scratch JAX/XLA/Pallas design: NHWC layouts, pure functions over pytree
parameters, one jit-compiled device invocation per edit, `jax.sharding.Mesh`
data/patch parallelism for multi-chip.
"""

__version__ = "0.1.0"
