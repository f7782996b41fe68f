"""visdom stub (imported at module scope by the reference's model files;
the control harness always runs with opt.visdom disabled)."""


class Visdom:
    def __init__(self, *args, **kwargs):
        raise RuntimeError("visdom is stubbed out in the control harness; "
                           "run with --visdom! (disabled)")
