"""Console entry points (pyproject [project.scripts]).

The repo-root shims (test.py / train.py / serve_api.py / demo.py) call the
same mains, preserving the reference's `python test.py --flags` launch
surface (test_celeb.sh runs unchanged); an installed wheel exposes them as
sketchedit-{test,train,serve,demo}.
"""


def test_main():
    from sketchedit_tpu.cli.infer import main
    main()


def train_main():
    from sketchedit_tpu.cli.train import main
    main()


def serve_main():
    from sketchedit_tpu.cli.serve import main
    main()


def demo_main():
    from sketchedit_tpu.cli.demo import main
    main()
