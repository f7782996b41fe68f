"""ipdb stub (imported by the reference's util.py; never invoked headless)."""

import pdb

set_trace = pdb.set_trace
