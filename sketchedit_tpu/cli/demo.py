"""Interactive demo CLI — equivalent of the reference demo.py.

Serves the canvas sketch-editing UI on --port, using the same options
surface; --face_crop additionally enables the detect-crop-edit-paste
composite for full-body photos.

Example:
    python demo.py --name celeb --joint_train_inp --use_cam \
        --pool_type max --dataset_mode base \
        --filelist ./static/images/example.txt --port 9998
"""

import os


def main():
    from sketchedit_tpu.options.test_options import TestOptions

    class DemoOptions(TestOptions):
        def initialize(self, parser):
            parser = TestOptions.initialize(self, parser)
            parser.add_argument('--face_crop', action='store_true',
                                help='detect-crop-edit-paste composite for '
                                     'full-body photos (bundled average-'
                                     'face NCC localizer, sketch+skin-blob '
                                     'fallback; server/face_localizer.py)')
            # interactive path defaults to the throughput config (bf16
            # activations, backend-default MXU passes) — ~1.6x fp32 latency
            # on v5e, visually indistinguishable; test.py / the golden gate
            # keep fp32/highest for checkpoint parity.
            parser.set_defaults(dataset_mode='base',
                                compute_dtype='bfloat16',
                                precision='default')
            return parser

    opt = DemoOptions().parse()

    from sketchedit_tpu.runner import build_pipeline
    from sketchedit_tpu.server.demo_server import DemoApp, serve

    pipeline = build_pipeline(opt)
    app = DemoApp(pipeline, static_root="static", filelist=opt.filelist,
                  face_crop=opt.face_crop)
    serve(app, opt.port)


if __name__ == "__main__":
    main()
