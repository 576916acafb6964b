"""Batch-inference CLI — drop-in equivalent of the reference test.py.

Same flags (see test_celeb.sh), same output conventions: composed image
denormalized from [-1,1] to uint8 RGB written to --output_dir/<name>, and
the predicted soft mask written as uint8*255 grayscale to --output_mask_dir
when given. --how_many bounds the number of images.
"""

import os

import numpy as np

from sketchedit_tpu.options.test_options import TestOptions
from sketchedit_tpu import data
from sketchedit_tpu.runner import build_pipeline
from sketchedit_tpu.utils.imaging import tensor2im, mask2im, save_image


def main():
    opt = TestOptions().parse()
    dataloader = data.create_dataloader(opt)
    pipeline = build_pipeline(opt)

    processed = 0
    for i, batch in enumerate(dataloader):
        if i * opt.batchSize >= opt.how_many:
            break
        composed, mask = pipeline(batch['image'], batch['mask'])
        composed_u8 = tensor2im(composed)
        mask_u8 = mask2im(mask)
        for b in range(batch['valid']):
            path = batch['path'][b]
            print('process image... %s' % path)
            save_image(composed_u8[b], os.path.join(opt.output_dir, path))
            if getattr(opt, 'output_mask_dir', None):
                save_image(mask_u8[b],
                           os.path.join(opt.output_mask_dir, path))
            processed += 1
    print(f"done: {processed} images -> {opt.output_dir}")


if __name__ == '__main__':
    main()
