"""Device-side (JAX/Pallas) compute ops."""
from .geometry import shuffle_dim
from .length_regulator import gaussian_upsample, length_regulate
from .losses import (attention_guide, guided_attention_loss, masked_l1_loss,
                     masked_l2_loss, masked_softmax_cross_entropy,
                     stop_token_bce, weighted_mean)
from .masking import (combine_mask, future_mask, make_non_pad_mask,
                      make_pad_mask, masked_fill, sequence_mask)
from .normalizer import ZScore
from .positional import sinusoid_position_encoding
from .ssim import ssim
from .stft import (dft_basis, frame, log_mel_spectrogram, mel_spectrogram,
                   stft, stft_magnitude)
from .stft_loss import (MultiResolutionSTFTLoss, log_stft_magnitude_loss,
                        multi_resolution_stft_loss,
                        spectral_convergence_loss, stft_loss)

__all__ = [
    "shuffle_dim",
    "length_regulate", "gaussian_upsample",
    "weighted_mean", "masked_l1_loss", "masked_l2_loss",
    "masked_softmax_cross_entropy", "stop_token_bce", "attention_guide",
    "guided_attention_loss",
    "sequence_mask", "make_pad_mask", "make_non_pad_mask", "future_mask",
    "combine_mask", "masked_fill",
    "ZScore", "sinusoid_position_encoding", "ssim",
    "stft", "stft_magnitude", "mel_spectrogram", "log_mel_spectrogram",
    "dft_basis", "frame",
    "stft_loss", "multi_resolution_stft_loss", "MultiResolutionSTFTLoss",
    "spectral_convergence_loss", "log_stft_magnitude_loss",
]
