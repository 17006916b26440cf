"""Text front ends: normalization + G2P -> symbol ids.

Equivalent of the reference package (reference: parakeet/frontend/):
English (character / ARPABET) and Chinese (textnorm + tone sandhi +
pinyin) pipelines, vocab, punctuation, rule-generated pinyin lexicon.
"""
from .arpabet import (ARPABET, ARPABET_PHONES, ARPABET_STRESS_PHONES,
                      ARPABETWithStress, LexiconG2P, RuleG2P, get_g2p)
from .generate_lexicon import (FINALS, INITIALS, generate_lexicon,
                               split_syllable, syllable_to_phones)
from .normalizer import normalize as normalize_en
from .phonectic import English, EnglishCharacter, Phonetics
from .pinyin import ParakeetPinyin, ParakeetPinyinWithTone
from .punctuation import get_punctuations
from .tone_sandhi import ToneSandhi
from .vocab import Vocab
from .zh_frontend import Frontend
from .zh_normalization import TextNormalizer

__all__ = [
    "Vocab", "Phonetics", "English", "EnglishCharacter",
    "ARPABET", "ARPABETWithStress",
    "ARPABET_PHONES", "ARPABET_STRESS_PHONES", "RuleG2P", "LexiconG2P",
    "get_g2p", "normalize_en", "get_punctuations",
    "Frontend", "TextNormalizer", "ToneSandhi",
    "ParakeetPinyin", "ParakeetPinyinWithTone",
    "generate_lexicon", "split_syllable", "syllable_to_phones",
    "INITIALS", "FINALS",
]
