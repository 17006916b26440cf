"""Reusable flax.linen network modules."""
from .conv import Conv1dBatchNorm, Conv1dCell, GLU
from .lightconv import LightweightConvolution
from .postnet import Postnet, Prenet
from .predictors import (DurationPredictor, VariancePredictor,
                         VarianceEmbedding, duration_predictor_loss)
from .transformer import (DecoderLayer, EncoderLayer, MultiHeadAttention,
                          MultiLayerConv, PositionalEncoding,
                          PositionwiseFeedForward, ScaledPositionalEncoding,
                          TransformerDecoder, TransformerEncoder)

__all__ = [
    "Postnet", "Prenet",
    "Conv1dCell", "Conv1dBatchNorm", "GLU", "LightweightConvolution",
    "DurationPredictor", "VariancePredictor", "VarianceEmbedding",
    "duration_predictor_loss",
    "MultiHeadAttention", "PositionwiseFeedForward", "MultiLayerConv",
    "PositionalEncoding", "ScaledPositionalEncoding", "EncoderLayer",
    "TransformerEncoder", "DecoderLayer", "TransformerDecoder",
]
