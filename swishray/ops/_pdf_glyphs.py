"""PDF font encodings + a glyph-name table (ISO 32000-1 Annex D and
the public Adobe Glyph List conventions).

Everything here is GENERATED at import from public stdlib data:
WinAnsiEncoding is cp1252 and MacRomanEncoding is mac-roman (Annex D
says so explicitly), so those two tables come from Python's codecs;
glyph names for /Differences arrays are synthesized from
unicodedata.lookup over the regular Latin construction patterns plus
the small irregular set Annex D itself lists.  ``uniXXXX`` and
``uXXXX[XX]`` names parse numerically per the AGL specification.
"""
from __future__ import annotations

import unicodedata

__all__ = ["WIN_ANSI", "MAC_ROMAN", "STANDARD", "PDF_DOC",
           "glyph_to_unicode", "base_encoding"]


def _codec_table(codec: str) -> list[str | None]:
    out: list[str | None] = []
    for i in range(256):
        try:
            out.append(bytes([i]).decode(codec))
        except UnicodeDecodeError:
            out.append(None)
    return out


WIN_ANSI = _codec_table("cp1252")
# Annex D: WinAnsi shows bullet for the unused cp1252 slots
for _i, _v in enumerate(WIN_ANSI):
    if _v is None and _i >= 0x80:
        WIN_ANSI[_i] = "•"
MAC_ROMAN = _codec_table("mac_roman")

# StandardEncoding (Annex D.2): ASCII except quote characters, plus
# the Adobe symbol/high range.  Codes are the Annex's octal values.
STANDARD: list[str | None] = [None] * 256
for _i in range(0x20, 0x7F):
    STANDARD[_i] = chr(_i)
STANDARD[0x27] = "’"   # quoteright
STANDARD[0x60] = "‘"   # quoteleft
for _oct, _ch in {
    0o241: "¡", 0o242: "¢", 0o243: "£",
    0o244: "⁄", 0o245: "¥", 0o246: "ƒ",
    0o247: "§", 0o250: "¤", 0o251: "'",
    0o252: "“", 0o253: "«", 0o254: "‹",
    0o255: "›", 0o256: "ﬁ", 0o257: "ﬂ",
    0o261: "–", 0o262: "†", 0o263: "‡",
    0o264: "·", 0o266: "¶", 0o267: "•",
    0o270: "‚", 0o271: "„", 0o272: "”",
    0o273: "»", 0o274: "…", 0o275: "‰",
    0o277: "¿", 0o301: "`", 0o302: "´",
    0o303: "ˆ", 0o304: "˜", 0o305: "¯",
    0o306: "˘", 0o307: "˙", 0o310: "¨",
    0o312: "˚", 0o313: "¸", 0o315: "˝",
    0o316: "˛", 0o317: "ˇ", 0o320: "—",
    0o341: "Æ", 0o343: "ª", 0o350: "Ł",
    0o351: "Ø", 0o352: "Œ", 0o353: "º",
    0o361: "æ", 0o365: "ı", 0o370: "ł",
    0o371: "ø", 0o372: "œ", 0o373: "ß",
}.items():
    STANDARD[_oct] = _ch

# PDFDocEncoding (Annex D.3): latin-1 with the 0x18-0x1F and
# 0x80-0x9F ranges holding accents/punctuation; the latin-1 base is
# what string metadata needs in practice.
PDF_DOC: list[str | None] = [chr(i) for i in range(256)]


def _build_glyph_names() -> dict[str, str]:
    names: dict[str, str] = {}
    # letters name themselves
    for c in range(ord("A"), ord("Z") + 1):
        names[chr(c)] = chr(c)
        names[chr(c + 32)] = chr(c + 32)
    # digits and ASCII punctuation (AGL standard names)
    for n, ch in {
        "space": " ", "exclam": "!", "quotedbl": '"',
        "numbersign": "#", "dollar": "$", "percent": "%",
        "ampersand": "&", "quotesingle": "'", "parenleft": "(",
        "parenright": ")", "asterisk": "*", "plus": "+",
        "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
        "zero": "0", "one": "1", "two": "2", "three": "3",
        "four": "4", "five": "5", "six": "6", "seven": "7",
        "eight": "8", "nine": "9", "colon": ":", "semicolon": ";",
        "less": "<", "equal": "=", "greater": ">", "question": "?",
        "at": "@", "bracketleft": "[", "backslash": "\\",
        "bracketright": "]", "asciicircum": "^", "underscore": "_",
        "grave": "`", "braceleft": "{", "bar": "|",
        "braceright": "}", "asciitilde": "~",
    }.items():
        names[n] = ch
    # accented Latin: construct from unicodedata lookup patterns
    accents = {
        "acute": "ACUTE", "grave": "GRAVE",
        "circumflex": "CIRCUMFLEX", "dieresis": "DIAERESIS",
        "tilde": "TILDE", "ring": "RING ABOVE",
        "cedilla": "CEDILLA", "macron": "MACRON", "breve": "BREVE",
        "caron": "CARON", "ogonek": "OGONEK",
        "hungarumlaut": "DOUBLE ACUTE", "dotaccent": "DOT ABOVE",
        "slash": "STROKE",
    }
    for base in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
        for suffix, uname in accents.items():
            for case, b in (("CAPITAL", base), ("SMALL", base.lower())):
                try:
                    ch = unicodedata.lookup(
                        f"LATIN {case} LETTER {base} WITH {uname}")
                except KeyError:
                    continue
                names[f"{b}{suffix}"] = ch
    # the irregular set the Annex D tables use
    for n, ch in {
        "quoteright": "’", "quoteleft": "‘",
        "quotedblleft": "“", "quotedblright": "”",
        "quotesinglbase": "‚", "quotedblbase": "„",
        "guillemotleft": "«", "guillemotright": "»",
        "guilsinglleft": "‹", "guilsinglright": "›",
        "endash": "–", "emdash": "—",
        "bullet": "•", "dagger": "†",
        "daggerdbl": "‡", "periodcentered": "·",
        "paragraph": "¶", "section": "§",
        "ellipsis": "…", "perthousand": "‰",
        "fraction": "⁄", "florin": "ƒ",
        "cent": "¢", "sterling": "£", "yen": "¥",
        "currency": "¤", "Euro": "€",
        "exclamdown": "¡", "questiondown": "¿",
        "ordfeminine": "ª", "ordmasculine": "º",
        "AE": "Æ", "ae": "æ", "OE": "Œ",
        "oe": "œ", "Oslash": "Ø", "oslash": "ø",
        "Lslash": "Ł", "lslash": "ł",
        "germandbls": "ß", "dotlessi": "ı",
        "fi": "ﬁ", "fl": "ﬂ",
        "degree": "°", "plusminus": "±",
        "multiply": "×", "divide": "÷",
        "logicalnot": "¬", "mu": "µ",
        "onequarter": "¼", "onehalf": "½",
        "threequarters": "¾", "onesuperior": "¹",
        "twosuperior": "²", "threesuperior": "³",
        "copyright": "©", "registered": "®",
        "trademark": "™", "brokenbar": "¦",
        "nbspace": " ", "sfthyphen": "­",
        "minus": "−", "Scaron": "Š", "scaron": "š",
        "Zcaron": "Ž", "zcaron": "ž",
        "Ydieresis": "Ÿ", "Thorn": "Þ",
        "thorn": "þ", "Eth": "Ð", "eth": "ð",
        ".notdef": "",
    }.items():
        names[n] = ch
    return names


_GLYPH_NAMES = _build_glyph_names()


def glyph_to_unicode(name: str) -> str | None:
    """Resolve a glyph name per AGL conventions; None if unknown."""
    got = _GLYPH_NAMES.get(name)
    if got is not None:
        return got
    if name.startswith("uni") and len(name) >= 7:
        try:
            return "".join(chr(int(name[i:i + 4], 16))
                           for i in range(3, len(name) - 3, 4))
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            cp = int(name[1:], 16)
            return chr(cp) if cp <= 0x10FFFF else None
        except ValueError:
            return None
    # gXX / cidXX / indexed names carry no unicode semantics
    return None


def base_encoding(name: str | None) -> list[str | None]:
    if name == "WinAnsiEncoding":
        return WIN_ANSI
    if name == "MacRomanEncoding":
        return MAC_ROMAN
    if name == "MacExpertEncoding":  # expert sets: no text value
        return [None] * 256
    return STANDARD
