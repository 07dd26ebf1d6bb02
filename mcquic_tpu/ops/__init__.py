from mcquic_tpu.ops.vq import (groupLatent, randomDrop, reassignCodebook, ungroupLatent,
                               vqDequantizeCodes, vqDequantizeSoft, vqDistance, vqEncode,
                               vqLogits)

__all__ = [
    "groupLatent", "ungroupLatent", "vqDistance", "vqLogits", "vqEncode",
    "vqDequantizeCodes", "vqDequantizeSoft", "randomDrop", "reassignCodebook",
]
