"""Attribute-access dictionary (stand-in for ``easydict.EasyDict``).

The reference passes an ``edict`` config everywhere (reference ``options.py``);
we keep the same ergonomics (``opt.nerf.depth.range``) but make conversion
explicit and recursive. Values that are dicts become ``DotDict`` on insertion,
lists of dicts are converted elementwise.
"""

from __future__ import annotations


class DotDict(dict):
    """dict with attribute access; nested dicts are converted recursively."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        if kwargs:
            d = {**d, **kwargs}
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _convert(v):
        if isinstance(v, dict) and not isinstance(v, DotDict):
            return DotDict(v)
        if isinstance(v, (list, tuple)):
            return type(v)(DotDict._convert(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, DotDict._convert(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __delattr__(self, k):
        try:
            del self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def copy(self):
        return DotDict({k: (v.copy() if isinstance(v, DotDict) else v) for k, v in self.items()})

    def to_plain(self):
        """Recursively convert back to plain dict/list (for YAML dumping)."""
        def conv(v):
            if isinstance(v, DotDict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [conv(x) for x in v]
            return v
        return conv(self)
