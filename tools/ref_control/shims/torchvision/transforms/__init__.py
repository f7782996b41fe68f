from . import functional  # noqa: F401


class ColorJitter:
    @staticmethod
    def get_params(*args, **kwargs):
        raise NotImplementedError("augmentation is disabled in the control "
                                  "harness (opt.data.augment is empty)")
