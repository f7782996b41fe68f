"""Minimal EasyDict stand-in for the reference control harness.

The reference depends on the `easydict` package (not installed here); this
reimplements its documented semantics: a dict whose items are also
attributes, with recursive wrapping of nested dicts (including dicts inside
lists/tuples) and attribute/items kept in sync on assignment.
"""


class EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        else:
            d = dict(d)
        if kwargs:
            d.update(**kwargs)
        for k, v in d.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, (list, tuple)):
            value = type(value)(
                self.__class__(x) if isinstance(x, dict) else x for x in value)
        elif isinstance(value, dict) and not isinstance(value, EasyDict):
            value = self.__class__(value)
        super().__setattr__(name, value)
        super().__setitem__(name, value)

    __setitem__ = __setattr__

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def update(self, e=None, **f):
        d = e or dict()
        d = dict(d)
        d.update(f)
        for k, v in d.items():
            setattr(self, k, v)

    def pop(self, k, *args):
        try:
            object.__delattr__(self, k)
        except AttributeError:
            pass
        return super().pop(k, *args)
