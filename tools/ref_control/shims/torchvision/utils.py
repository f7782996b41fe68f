def make_grid(*args, **kwargs):
    raise NotImplementedError("torchvision.utils is stubbed in the control "
                              "harness (visualization path is disabled)")
