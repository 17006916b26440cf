from .abbreviations import expand_abbreviations
from .normalizer import full_to_half_width, normalize
from .numbers import normalize_numbers, number_to_words, ordinal_to_words

__all__ = ["normalize", "full_to_half_width", "expand_abbreviations",
           "normalize_numbers", "number_to_words", "ordinal_to_words"]
