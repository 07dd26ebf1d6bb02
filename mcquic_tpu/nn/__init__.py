from mcquic_tpu.nn.blocks import (AttentionBlock, NonLocalBlock, ResidualBlock,
                                  ResidualBlockMasked, ResidualBlockShuffle,
                                  ResidualBlockWithStride)
from mcquic_tpu.nn.convs import (Conv, MaskedConv, PixelShuffleConv, conv1x1, conv3x3,
                                 conv5x5, pixelShuffle1x1, pixelShuffle3x3, pixelShuffle5x5)
from mcquic_tpu.nn.functional import (gumbelSoftmax, logExpMinusOne, lowerBound,
                                      nonNegativeApply, nonNegativeInit, oneHot,
                                      pixelShuffle, pixelUnshuffle)
from mcquic_tpu.nn.gdn import GenDivNorm, InvGenDivNorm

__all__ = [
    "AttentionBlock", "NonLocalBlock", "ResidualBlock", "ResidualBlockMasked",
    "ResidualBlockShuffle", "ResidualBlockWithStride",
    "Conv", "MaskedConv", "PixelShuffleConv", "conv1x1", "conv3x3", "conv5x5",
    "pixelShuffle1x1", "pixelShuffle3x3", "pixelShuffle5x5",
    "gumbelSoftmax", "logExpMinusOne", "lowerBound", "nonNegativeApply",
    "nonNegativeInit", "oneHot", "pixelShuffle", "pixelUnshuffle",
    "GenDivNorm", "InvGenDivNorm",
]
