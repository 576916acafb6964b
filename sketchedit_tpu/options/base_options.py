"""Config / options system.

Keeps the reference's CLI flag vocabulary (options/base_options.py:16-67)
so the released launch scripts (`test_celeb.sh`, `test_places.sh`) run
against this framework unchanged, but resolves component flags through
explicit registries instead of import-by-reflection.

Options snapshotting mirrors the reference (`opt.txt` + `opt.pkl`,
`--load_from_opt_file`; base_options.py:121-154) with JSON instead of
pickle — robust across framework versions and safe to load.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


class BaseOptions:
    isTrain = False

    def __init__(self):
        self.initialized = False

    def initialize(self, parser):
        # experiment specifics
        parser.add_argument('--name', type=str, default='label2coco',
                            help='experiment name; decides checkpoint subdir')
        parser.add_argument('--joint_train_inp', action='store_true',
                            help='zero the guide channel of the context '
                                 'stream (released checkpoints use this)')
        parser.add_argument('--gpu_ids', type=str, default='0',
                            help='accepted for script compatibility; device '
                                 'placement is managed by JAX')
        parser.add_argument('--checkpoints_dir', type=str,
                            default='./checkpoints')
        parser.add_argument('--model', type=str, default='editline2')
        parser.add_argument('--phase', type=str, default='train')

        # input/output sizes
        parser.add_argument('--batchSize', type=int, default=1)
        parser.add_argument('--preprocess_mode', type=str,
                            default='scale_width_and_crop',
                            choices=("resize_and_crop", "crop", "scale_width",
                                     "scale_width_and_crop", "scale_shortside",
                                     "scale_shortside_and_crop", "fixed",
                                     "none"))
        parser.add_argument('--load_size', type=int, default=1024)
        parser.add_argument('--crop_size', type=int, default=512)
        parser.add_argument('--aspect_ratio', type=float, default=1.0)
        parser.add_argument('--output_nc', type=int, default=3)

        # data
        parser.add_argument('--dataroot', type=str,
                            default='./datasets/cityscapes/')
        parser.add_argument('--dataset_mode', type=str, default='testimage')
        parser.add_argument('--serial_batches', action='store_true')
        parser.add_argument('--no_flip', action='store_true')
        parser.add_argument('--nThreads', default=0, type=int,
                            help='host-side prefetch threads')
        parser.add_argument('--max_dataset_size', type=int, default=sys.maxsize)
        parser.add_argument('--load_from_opt_file', action='store_true')
        parser.add_argument('--cache_filelist_write', action='store_true',
                            help='write the recursive file listing to a '
                                 'files.list cache next to the data')
        parser.add_argument('--cache_filelist_read', action='store_true',
                            help='read the files.list cache if present')
        parser.add_argument('--display_winsize', type=int, default=400,
                            help='accepted for script compatibility '
                                 '(reference base_options.py:51); unused')

        # generator
        parser.add_argument('--netG', type=str, default='deepfillc2')
        parser.add_argument('--ngf', type=int, default=64)
        parser.add_argument('--init_type', type=str, default='xavier')
        parser.add_argument('--init_variance', type=float, default=0.02)
        parser.add_argument('--z_dim', type=int, default=256)

        # netG-specific flags (registered by DeepFillC2Generator in the
        # reference, editline_g.py:14-23)
        parser.add_argument('--use_cam', action='store_true')
        parser.add_argument('--pool_type', default='avg')
        parser.add_argument('--no_mask_cc', action='store_true')
        parser.add_argument('--no_mask_coarse', action='store_true')

        # TPU-native execution controls (new surface)
        parser.add_argument('--compute_dtype', type=str, default='float32',
                            choices=('float32', 'bfloat16'),
                            help='activation dtype on device')
        parser.add_argument('--precision', type=str, default='highest',
                            choices=('default', 'highest'),
                            help="conv/matmul precision; 'highest' for "
                                 "checkpoint parity, 'default' for speed")
        parser.add_argument('--attention_impl', type=str, default='auto',
                            choices=('auto', 'xla', 'pallas', 'sharded'),
                            help="'sharded' splits the attention query-"
                                 "patch axis over all local devices "
                                 "(single-image giant-resolution editing)")
        parser.add_argument('--data_parallel', type=int, default=0,
                            help='shard batches over N devices (0 = all '
                                 'local devices if >1)')

        self.initialized = True
        return parser

    def gather_options(self):
        parser = argparse.ArgumentParser(
            formatter_class=argparse.ArgumentDefaultsHelpFormatter)
        parser = self.initialize(parser)
        opt, _ = parser.parse_known_args()

        # dataset-specific flags, resolved via the data registry
        from sketchedit_tpu import data as data_mod
        parser = data_mod.get_option_setter(opt.dataset_mode)(
            parser, self.isTrain)

        opt, _ = parser.parse_known_args()
        if opt.load_from_opt_file:
            parser = self._update_defaults_from_file(parser, opt)
        opt = parser.parse_args()
        self.parser = parser
        return opt

    # --- option snapshotting -------------------------------------------
    def _option_path(self, opt, makedir=False):
        expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        if makedir:
            os.makedirs(expr_dir, exist_ok=True)
        return os.path.join(expr_dir, 'opt')

    def save_options(self, opt):
        base = self._option_path(opt, makedir=True)
        with open(base + '.txt', 'wt') as f:
            for k, v in sorted(vars(opt).items()):
                default = self.parser.get_default(k)
                note = '' if v == default else f'\t[default: {default}]'
                f.write(f'{str(k):>25}: {str(v):<30}{note}\n')
        payload = {k: v for k, v in vars(opt).items()
                   if isinstance(v, (int, float, str, bool, type(None)))}
        with open(base + '.json', 'wt') as f:
            json.dump(payload, f, indent=1)

    def _update_defaults_from_file(self, parser, opt):
        base = self._option_path(opt)
        with open(base + '.json') as f:
            saved = json.load(f)
        known = {a.dest for a in parser._actions}
        for k, v in saved.items():
            # only override registered flags: the snapshot may carry
            # namespace-only keys (isTrain, keys from another options
            # class) which set_defaults would silently inject
            if k in known:
                parser.set_defaults(**{k: v})
        return parser

    def print_options(self, opt):
        lines = ['----------------- Options ---------------']
        for k, v in sorted(vars(opt).items()):
            default = self.parser.get_default(k)
            note = '' if v == default else f'\t[default: {default}]'
            lines.append(f'{str(k):>25}: {str(v):<30}{note}')
        lines.append('----------------- End -------------------')
        print('\n'.join(lines))

    def parse(self, save=None):
        """save: None = reference default (snapshot opt.txt/opt.json when
        isTrain); True forces a snapshot; False suppresses it — eval/tool
        scripts that parse TrainOptions against an EXISTING run directory
        (scripts/mask_eval.py) must not clobber the training run's
        snapshot, which --load_from_opt_file later reads back."""
        opt = self.gather_options()
        opt.isTrain = self.isTrain
        self.print_options(opt)
        if (opt.isTrain and save is not False) or save:
            self.save_options(opt)
        # script-compat: parse gpu_ids but JAX owns placement
        opt.gpu_ids = [int(s) for s in str(opt.gpu_ids).split(',')
                       if s and int(s) >= 0]
        self.opt = opt
        return opt
