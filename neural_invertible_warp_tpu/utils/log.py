"""Minimal colored console logger (capability parity with reference util.py Log)."""

from __future__ import annotations

import shutil
import sys
import time

_START = time.time()

_COLORS = dict(red=31, green=32, yellow=33, blue=34, magenta=35, cyan=36)


def _c(text, color=None, bold=False):
    if color is None and not bold:
        return text
    codes = []
    if bold:
        codes.append("1")
    if color:
        codes.append(str(_COLORS[color]))
    return "\033[{}m{}\033[0m".format(";".join(codes), text)


def _elapsed():
    s = int(time.time() - _START)
    return "{:02d}:{:02d}:{:02d}".format(s // 3600, (s % 3600) // 60, s % 60)


def info(msg):
    print(_c("[{}] ".format(_elapsed()), "green") + str(msg))
    sys.stdout.flush()


def warn(msg):
    print(_c("[{}] WARNING: ".format(_elapsed()), "yellow") + str(msg))
    sys.stdout.flush()


def error(msg):
    print(_c("[{}] ERROR: ".format(_elapsed()), "red") + str(msg), file=sys.stderr)
    sys.stderr.flush()


def title(msg):
    width = shutil.get_terminal_size((80, 20)).columns
    print(_c("=" * min(width, 80), "cyan", bold=True))
    print(_c(str(msg), "cyan", bold=True))
    print(_c("=" * min(width, 80), "cyan", bold=True))
    sys.stdout.flush()


def options(opt, indent=0):
    """Pretty-print a nested DotDict config."""
    for k in sorted(opt.keys()):
        v = opt[k]
        if isinstance(v, dict):
            print("  " * indent + _c("{}:".format(k), "blue"))
            options(v, indent + 1)
        else:
            print("  " * indent + _c("{}: ".format(k), "blue") + _c(str(v), "yellow"))
