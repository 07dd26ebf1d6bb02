from mcquic_tpu.models.compressor import Compressor, Neon
from mcquic_tpu.models.engine import CompressorEngine
from mcquic_tpu.models.quantizer import ResidualBackwardQuantizer, UMGMQuantizer

__all__ = ["Compressor", "Neon", "CompressorEngine",
           "ResidualBackwardQuantizer", "UMGMQuantizer"]
