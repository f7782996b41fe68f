"""LPIPS stub for the reference control harness.

The reference instantiates `lpips.LPIPS(net="alex")` at Model.__init__
(`model/nerf_inn_llff.py:25`) but only calls it during full evaluation,
which the control runs never reach. Returning 0 keeps construction working
without downloading AlexNet weights (no egress in this environment).
"""

import torch


class LPIPS(torch.nn.Module):
    def __init__(self, net="alex", **kwargs):
        super().__init__()
        self.net_name = net

    def forward(self, a, b):
        return torch.zeros((), dtype=torch.float32)
