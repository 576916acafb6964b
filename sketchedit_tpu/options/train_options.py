"""Training options.

The reference snapshot ships no train_options.py ("training code coming
soon", README.md:75-76) but its model code references these flags at its
call sites (editline2_model.py, SURVEY.md §2.8-2.9); this registers the
full set so the greenfield training stack (train/) is configurable the way
the reference intended.
"""

from sketchedit_tpu.options.base_options import BaseOptions


class TrainOptions(BaseOptions):
    isTrain = True

    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        # schedule
        parser.add_argument('--niter', type=int, default=50,
                            help='epochs at full lr')
        parser.add_argument('--niter_decay', type=int, default=0,
                            help='epochs with linearly decaying lr')
        parser.add_argument('--continue_train', action='store_true')
        parser.add_argument('--which_epoch', type=str, default='latest')
        # optimizer (TTUR pair per editline2_model.py:164-172)
        parser.add_argument('--lr', type=float, default=0.0002)
        parser.add_argument('--beta1', type=float, default=0.0)
        parser.add_argument('--beta2', type=float, default=0.9)
        parser.add_argument('--no_TTUR', action='store_true')
        # losses (g_image_loss, editline2_model.py:244-301)
        parser.add_argument('--gan_mode', type=str, default='hinge',
                            choices=('hinge', 'ls', 'original', 'w'))
        parser.add_argument('--lambda_l1', type=float, default=1.0)
        parser.add_argument('--lambda_l1_mask', type=float, default=1.0)
        parser.add_argument('--lambda_vgg', type=float, default=10.0)
        parser.add_argument('--lambda_mask_rec', type=float, default=0.0,
                            help='direct BCE supervision of the predicted '
                                 'soft mask vs the sampled GT region '
                                 '(greenfield; 0 = reference-exact; BCE not '
                                 'L1 — L1 re-collapses through the saturated '
                                 'sigmoid, see losses.mask_bce_loss). The '
                                 'objective as shipped admits a zero-mask '
                                 'collapse when inputs==gt — see '
                                 'train/trainer.py g_image_loss')
        parser.add_argument('--no_gan_loss', action='store_true')
        parser.add_argument('--no_vgg_loss', action='store_true')
        parser.add_argument('--vgg_imagenet_norm', type=int, default=1,
                            choices=(0, 1),
                            help='1 (default): remap [-1,1] to ImageNet '
                                 'normalization before VGG19; 0: SPADE-'
                                 'lineage behavior (feed [-1,1] straight '
                                 'in)')
        parser.add_argument('--no_ganFeat_loss', action='store_true',
                            default=True)
        parser.add_argument('--filt_maskim', action='store_true')
        parser.add_argument('--no_detach', action='store_true')
        parser.add_argument('--reuse_fake', action='store_true',
                            help='speed option: reuse the G-step fakes for '
                                 'the D update (skips the reference-exact '
                                 'regeneration)')
        parser.add_argument('--remat', action='store_true',
                            help='rematerialize the generator forward in '
                                 'the backward pass (halves activation '
                                 'memory for larger train batches)')
        # partial updates (get_param_list groups)
        parser.add_argument('--update_part', type=str, default='all')
        parser.add_argument('--load_pretrained_mask', type=str)
        parser.add_argument('--load_pretrained_g', type=str)
        parser.add_argument('--load_pretrained_d', type=str)
        # discriminator
        parser.add_argument('--netD', type=str, default='sngan',
                            choices=('sngan', 'multiscale'))
        parser.add_argument('--num_D', type=int, default=2,
                            help='scales for --netD multiscale')
        parser.add_argument('--ndf', type=int, default=64)
        # synthetic masks (MaskCreator, create_mask.py + editline2_model.py:206-221)
        parser.add_argument('--path_objectshape_list', type=str)
        parser.add_argument('--path_objectshape_base', type=str)
        parser.add_argument('--not_om', action='store_true',
                            help='never use object masks')
        # data aug
        parser.add_argument('--cjit', type=float, default=None,
                            help='color-jitter strength')
        parser.add_argument('--dataset_mode_train', type=str)
        parser.add_argument('--dataset_mode_val', type=str)
        # held-out validation + structured metrics (train/validation.py;
        # greenfield — the reference ships no training code)
        parser.add_argument('--val_image_dir', type=str, default='',
                            help='held-out image dir; when set, PSNR/SSIM/'
                                 'mask-IoU validation runs during training')
        parser.add_argument('--val_items', type=int, default=8,
                            help='held-out items in the fixed val batch')
        parser.add_argument('--val_epoch_freq', type=int, default=1,
                            help='validate every N epochs')
        parser.add_argument('--val_track', type=str, default='auto',
                            choices=['auto', 'psnr', 'ssim', 'region_psnr',
                                     'region_l1', 'outside_l1', 'mask_iou'],
                            help='metric deciding the best_net_* snapshot; '
                                 'auto = mask_iou when --lambda_mask_rec > 0 '
                                 'else psnr (reconstruction metrics REWARD '
                                 'the zero-mask collapse when inputs==gt — '
                                 'docs/PARITY.md "Known deltas" — so a psnr-'
                                 'tracked live-mask run snapshots the '
                                 'collapse as "best")')
        parser.add_argument('--metrics_log', type=str, default='auto',
                            help="JSONL metrics log: 'auto' = <run_dir>/"
                                 "metrics.jsonl, 'off' disables, else a path")
        # bookkeeping (IterationCounter)
        parser.add_argument('--save_epoch_freq', type=int, default=10)
        parser.add_argument('--save_latest_freq', type=int, default=5000)
        parser.add_argument('--print_freq', type=int, default=100)
        parser.add_argument('--display_freq', type=int, default=100)
        # training defaults diverge from the eval-parity flags: backend-
        # default matmul precision (the bf16 throughput config the bench
        # numbers use; pass --precision highest for parity-grade passes)
        # and kaiming init (xavier gain 0.02 underflows this norm-free
        # stack — --init_type xavier stays available for strict compat)
        parser.set_defaults(phase='train', precision='default',
                            init_type='kaiming')
        return parser
