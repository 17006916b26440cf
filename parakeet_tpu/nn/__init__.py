"""Reusable flax.linen network modules."""
from .postnet import Postnet, Prenet
from .predictors import (DurationPredictor, VariancePredictor,
                         VarianceEmbedding, duration_predictor_loss)
from .transformer import (DecoderLayer, EncoderLayer, MultiHeadAttention,
                          MultiLayerConv, PositionalEncoding,
                          PositionwiseFeedForward, ScaledPositionalEncoding,
                          TransformerDecoder, TransformerEncoder)

__all__ = [
    "Postnet", "Prenet",
    "DurationPredictor", "VariancePredictor", "VarianceEmbedding",
    "duration_predictor_loss",
    "MultiHeadAttention", "PositionwiseFeedForward", "MultiLayerConv",
    "PositionalEncoding", "ScaledPositionalEncoding", "EncoderLayer",
    "TransformerEncoder", "DecoderLayer", "TransformerDecoder",
]
