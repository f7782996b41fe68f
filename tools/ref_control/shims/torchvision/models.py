"""torchvision.models stand-in: random-init VGG-16 with torchvision's exact
`features` layer sequence (needed by DenseMatching's VGGPyramid; pretrained
weights are unavailable offline — parity harnesses compare random-init
networks with weights copied across implementations)."""

import torch
import torch.nn as nn

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


def vgg16(pretrained=False, **kwargs):
    layers = []
    c_in = 3
    for v in _VGG16_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(c_in, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            c_in = v

    model = nn.Module()
    model.features = nn.Sequential(*layers)
    return model
