"""Chinese number verbalization rules.

Equivalent of the reference rules (reference:
parakeet/frontend/zh_normalization/num.py, 249 LoC): cardinals, decimals,
fractions, percentages, ranges, negative numbers, and the "2 -> 两"
quantifier reading.
"""
from __future__ import annotations

import re

__all__ = [
    "num2str", "verbalize_cardinal", "verbalize_digit",
    "RE_NUMBER", "RE_FRAC", "RE_PERCENTAGE", "RE_RANGE", "RE_INTEGER",
    "RE_DEFAULT_NUM", "RE_POSITIVE_QUANTIFIERS", "RE_TWO",
    "replace_number", "replace_frac", "replace_percentage",
    "replace_range", "replace_negative_num", "replace_default_num",
    "replace_positive_quantifier",
]

DIGITS = {str(i): c for i, c in enumerate("零一二三四五六七八九")}
UNITS = {1: "十", 2: "百", 3: "千", 4: "万", 8: "亿"}


def verbalize_digit(value_string: str, alt_one: bool = False) -> str:
    """Digit-by-digit reading (phone numbers, IDs); 1 -> 幺 optionally."""
    result = "".join(DIGITS[d] for d in value_string if d in DIGITS)
    if alt_one:
        result = result.replace("一", "幺")
    return result


def _verbalize_section(section: str) -> str:
    """Verbalize a <10000 section, e.g. '2034' -> 二千零三十四."""
    n = int(section)
    if n == 0:
        return DIGITS["0"]
    out = []
    length = len(str(n))
    s = str(n)
    zero_pending = False
    for i, d in enumerate(s):
        pos = length - i - 1
        if d == "0":
            zero_pending = True
            continue
        if zero_pending and out:
            out.append(DIGITS["0"])
        zero_pending = False
        out.append(DIGITS[d])
        if pos in (1, 2, 3):
            out.append(UNITS[pos])
    word = "".join(out)
    # 一十X -> 十X
    if word.startswith("一十"):
        word = word[1:]
    return word


def verbalize_cardinal(value_string: str) -> str:
    """Cardinal reading of a non-negative integer string."""
    value_string = value_string.lstrip("0") or "0"
    n = int(value_string)
    if n == 0:
        return DIGITS["0"]
    # split into 万-scale sections of 4 digits
    s = str(n)
    sections = []
    while s:
        sections.append(s[-4:])
        s = s[:-4]
    # sections[0] = ones, [1] = 万, [2] = 亿, [3] = 万亿
    scale_names = ["", "万", "亿", "万亿"]
    out = []
    for i in reversed(range(len(sections))):
        sec = sections[i]
        if int(sec) == 0:
            continue
        word = _verbalize_section(sec)
        # inner zero padding between sections (e.g. 10005 -> 一万零五)
        if out and len(sec.lstrip("0")) < 4 and int(sec) != 0:
            out.append(DIGITS["0"])
        out.append(word + scale_names[i])
    return "".join(out) or DIGITS["0"]


def num2str(value_string: str) -> str:
    """Number string (may contain a decimal point) -> Chinese reading."""
    value_string = value_string.strip()
    if "." in value_string:
        integer, frac = value_string.split(".", 1)
        frac = frac.rstrip("0")
        integer_part = verbalize_cardinal(integer or "0")
        if frac:
            return integer_part + "点" + verbalize_digit(frac)
        return integer_part
    return verbalize_cardinal(value_string)


RE_FRAC = re.compile(r"(-?)(\d+)/(\d+)")
RE_PERCENTAGE = re.compile(r"(-?)(\d+(\.\d+)?)%")
RE_RANGE = re.compile(r"(\d+(\.\d+)?)[~~—-](\d+(\.\d+)?)")
RE_INTEGER = re.compile(r"(-)(\d+)")
RE_NUMBER = re.compile(r"(-?)((\d+)(\.\d+)?)|(\.(\d+))")
RE_DEFAULT_NUM = re.compile(r"\d{3}\d*")
RE_POSITIVE_QUANTIFIERS = re.compile(
    r"(\d+)([多余几])?"
    r"(个|倍|次|句|位|份|批|届|级|种|套|笔|根|块|件|座|步|颗|棵|节|支|只|"
    r"名|年|月|日|号|朵|克|吨|米|条|张|片|间|双|台|组|层|首|期|辆|家|样|"
    r"瓶|杯|本|册|部|夜|场|枚|页|篇|栋|匹|堆|秒|分|时|斤|公斤|两)")
RE_TWO = re.compile("2")


def replace_frac(match) -> str:
    sign, num, den = match.group(1), match.group(2), match.group(3)
    return (("负" if sign else "") + num2str(den) + "分之" + num2str(num))


def replace_percentage(match) -> str:
    sign, pct = match.group(1), match.group(2)
    return ("负" if sign else "") + "百分之" + num2str(pct)


def replace_range(match) -> str:
    a, b = match.group(1), match.group(3)
    return num2str(a) + "到" + num2str(b)


def replace_negative_num(match) -> str:
    return "负" + num2str(match.group(2))


def replace_number(match) -> str:
    sign = match.group(1)
    number = match.group(2) or match.group(5)
    if number is None:
        return match.group(0)
    if number.startswith("."):
        return ("负" if sign else "") + "零" + num2str("0" + number)[1:]
    return ("负" if sign else "") + num2str(number)


def replace_default_num(match) -> str:
    """Long digit strings read digit-by-digit."""
    return verbalize_digit(match.group(0))


def replace_positive_quantifier(match) -> str:
    """'2个' -> 两个 etc."""
    number, suffix, quantifier = (match.group(1), match.group(2) or "",
                                  match.group(3))
    reading = num2str(number)
    if number == "2":
        reading = "两"
    return reading + suffix + quantifier
