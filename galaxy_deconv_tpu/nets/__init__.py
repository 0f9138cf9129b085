"""Denoiser networks and the hyperparameter network (L1 nets).

flax.linen modules in NHWC (the TPU-native convolution layout), fp32 params
with an optional bf16 compute dtype.  Capability parity:

- :class:`ResUNet`     ↔ reference ``models/ResUNet.py`` (+ ``resnet_basicblock.py``)
- :class:`XDenseUNet`  ↔ reference ``models/XDenseUNet.py``
- :class:`SubNet`      ↔ reference ``models/unrolled_admm_gaussian.py:43-71`` /
                         ``models/Unrolled_ADMM.py:59-90``
"""

from galaxy_deconv_tpu.nets.blocks import DoubleConv, ResBlock
from galaxy_deconv_tpu.nets.resunet import ResUNet
from galaxy_deconv_tpu.nets.subnet import SubNet
from galaxy_deconv_tpu.nets.xdense_unet import XDenseUNet

__all__ = ["DoubleConv", "ResBlock", "ResUNet", "SubNet", "XDenseUNet"]
