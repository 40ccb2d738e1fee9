"""S4 deep path — the embedded Type 1 font-*program* parser.

Re-expresses the reference's Type1FontFileParser
(/root/reference/src/utils/PdfFontInfoParser.cpp:191-866) over raw font
bytes: the cleartext header yields FontMatrix / ItalicAngle / Weight, the
eexec-encrypted body yields per-glyph bounding boxes by running the exact
charstring-interpreter subset the reference runs (move/line/curve ops
track the point extents; hint and flex ops manipulate the stacks without
painting).  The eexec/charstring decryption is the public algorithm of
the Adobe Type 1 Font Format specification (r=55665 body / r=4330
charstrings, c1=52845, c2=22719).

The parser consumes the PFA (hex) and raw-binary forms the reference
accepts after Poppler segment handling (…cpp:318-381); PFB segment
headers (0x80 0x01 / 0x80 0x02 framing) are handled inline.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

_C1 = 52845
_C2 = 22719
_INT_MIN = -(2 ** 31)


def decrypt(data: bytes, r: int, n: int) -> bytes:
    """Type 1 eexec decryption (…cpp:851-866): XOR with the high key byte,
    key update ((cipher + r) * c1 + c2) mod 2^16; the first ``n`` plaintext
    bytes (lenIV salt) are discarded."""
    out = bytearray()
    for i, cipher in enumerate(data):
        plain = cipher ^ (r >> 8)
        if i >= n:
            out.append(plain & 0xFF)
        r = ((cipher + r) * _C1 + _C2) & 0xFFFF
    return bytes(out)


def encrypt(data: bytes, r: int, n: int) -> bytes:
    """Inverse of :func:`decrypt` (used by the test fixture builder): the
    ``n`` salt bytes are prepended as zeros."""
    out = bytearray()
    for plain in b"\x00" * n + data:
        cipher = (plain ^ (r >> 8)) & 0xFF
        out.append(cipher)
        r = ((cipher + r) * _C1 + _C2) & 0xFFFF
    return bytes(out)


_WEIGHTS = {"Regular": 400, "Medium": 500, "Bold": 700}


def _parse_ascii_part(text: str, info: dict) -> None:
    """FontMatrix / ItalicAngle / Weight from the cleartext header
    (…cpp:246-311).  ItalicAngle/Weight: first occurrence wins (the
    reference sets those found-flags).  FontMatrix: LAST occurrence wins —
    the reference declares fontMatrixFound but never assigns it
    (PdfFontInfoParser.cpp:262-279), so every /FontMatrix line re-parses;
    mirrored here by not latching a found flag."""
    italic_found = weight_found = False
    for line in text.splitlines():
        if "/FontMatrix" in line:
            lsq = line.find("[", line.find("/FontMatrix") + 11)
            rsq = line.find("]", lsq + 1) if lsq != -1 else -1
            if rsq != -1:
                vals = []
                for tok in line[lsq + 1:rsq].split():
                    try:
                        vals.append(float(tok))
                    except ValueError:
                        break
                if vals:
                    m = list(info["font_matrix"])
                    m[:len(vals[:6])] = vals[:6]
                    info["font_matrix"] = tuple(m)
        if not italic_found and line.startswith("/ItalicAngle"):
            # the reference string-compares against "/ItalicAngle 0 def"
            # (…cpp:287-291); parse the angle numerically instead so
            # formatting variants of a zero angle ("0.0", extra spaces)
            # don't read as italic
            toks = line.split()
            angle = 0.0
            if len(toks) >= 2:
                try:
                    angle = float(toks[1])
                except ValueError:
                    angle = 1.0  # unparseable -> the reference's "not 0"
            info["is_italic"] = info["is_italic"] or angle != 0.0
            italic_found = True
        if not weight_found:
            start = line.find("/Weight (")
            if start != -1:
                end = line.find(")", start + 9)
                if end != -1:
                    w = _WEIGHTS.get(line[start + 9:end])
                    if w is not None:
                        info["weight"] = w  # stays None when absent so the
                        # caller can keep the wire-encoded weight
                    weight_found = True


def _push_number(cs: bytes, t: int, args: list) -> int:
    """Charstring number encoding (…cpp:828-846); returns the new index."""
    byte = cs[t]
    if byte <= 246:
        args.append(byte - 139)
    elif byte <= 250:
        t += 1
        args.append((byte - 247) * 256 + cs[t] + 108)
    elif byte <= 254:
        t += 1
        args.append(-(byte - 251) * 256 - cs[t] - 108)
    else:  # 255: signed 32-bit big-endian (two's complement like C int)
        v = (cs[t + 1] << 24) | (cs[t + 2] << 16) | (cs[t + 3] << 8) | cs[t + 4]
        if v >= 2 ** 31:
            v += _INT_MIN * 2
        args.append(v)
        t += 4
    return t


class _Box:
    __slots__ = ("cur_x", "cur_y", "left", "upper", "right", "lower")

    def __init__(self):
        self.cur_x = 0
        self.cur_y = 0
        self.left = 2 ** 31 - 1
        self.upper = 2 ** 31 - 1
        self.right = _INT_MIN
        self.lower = _INT_MIN

    def mark(self, *xs_ys):
        for x, y in xs_ys:
            if x < self.left:
                self.left = x
            if x > self.right:
                self.right = x
            if y < self.upper:
                self.upper = y
            if y > self.lower:
                self.lower = y


def _run_charstring(cs: bytes, subrs: Dict[int, bytes], box: _Box,
                    args: list, istack: list) -> None:
    """The reference's interpreter subset (…cpp:473-849): paint ops update
    the running point + extents; hints pop silently; callsubr recurses with
    the SHARED stacks; othersubr 0/1/3 mirror the flex handling including
    the case-0 fall-through."""
    t = 0
    n = len(cs)
    while t < n:
        byte = cs[t]
        if byte >= 32:
            t = _push_number(cs, t, args)
            t += 1
            continue
        if byte == 1 or byte == 3:  # hstem / vstem
            if len(args) >= 2:
                args.pop()
                args.pop()
        elif byte == 4:  # vmoveto (Y extents only, like the reference)
            if args:
                box.cur_y += args.pop()
                if box.cur_y < box.upper:
                    box.upper = box.cur_y
                if box.cur_y > box.lower:
                    box.lower = box.cur_y
        elif byte == 5:  # rlineto
            if len(args) >= 2:
                dy = args.pop()
                dx = args.pop()
                box.cur_x += dx
                box.cur_y += dy
                box.mark((box.cur_x, box.cur_y))
        elif byte == 6:  # hlineto
            if args:
                box.cur_x += args.pop()
                if box.cur_x < box.left:
                    box.left = box.cur_x
                if box.cur_x > box.right:
                    box.right = box.cur_x
        elif byte == 7:  # vlineto
            if args:
                box.cur_y += args.pop()
                if box.cur_y < box.upper:
                    box.upper = box.cur_y
                if box.cur_y > box.lower:
                    box.lower = box.cur_y
        elif byte == 8:  # rrcurveto
            if len(args) >= 6:
                dy3 = args.pop(); dx3 = args.pop()
                dy2 = args.pop(); dx2 = args.pop()
                dy1 = args.pop(); dx1 = args.pop()
                x1 = box.cur_x + dx1; y1 = box.cur_y + dy1
                x2 = x1 + dx2; y2 = y1 + dy2
                x3 = x2 + dx3; y3 = y2 + dy3
                box.cur_x = x3; box.cur_y = y3
                box.mark((x1, y1), (x2, y2), (x3, y3))
        elif byte == 10:  # callsubr
            if args:
                idx = args.pop()
                sub = subrs.get(idx)
                if sub is not None:
                    _run_charstring(sub, subrs, box, args, istack)
        elif byte == 12:  # escape
            t += 1
            b2 = cs[t] if t < n else 0
            if b2 in (1, 2):  # vstem3 / hstem3
                if len(args) >= 6:
                    del args[-6:]
            elif b2 == 6:  # seac
                if len(args) >= 5:
                    del args[-5:]
            elif b2 == 7:  # sbw
                if len(args) >= 4:
                    args.pop(); args.pop()
                    sby = args.pop(); sbx = args.pop()
                    box.cur_x = sbx; box.cur_y = sby
                    box.mark((sbx, sby))
            elif b2 == 12:  # div (C truncation toward zero)
                if len(args) >= 2:
                    num2 = args.pop(); num1 = args.pop()
                    args.append(int(num1 / num2))
            elif b2 == 16:  # callothersubr (flex machinery)
                if len(args) >= 2:
                    othersubr = args.pop()
                    num_args = args.pop()
                    istack.clear()
                    if othersubr == 0:
                        # …cpp:672-684: push two args, discard one, then
                        # FALL THROUGH into case 1 (which is a no-op)
                        istack.append(args.pop())
                        istack.append(args.pop())
                        args.pop()
                    elif othersubr == 1:
                        pass
                    elif othersubr == 3:
                        istack.append(args.pop())
                    else:
                        for _ in range(num_args):
                            istack.append(args.pop())
            elif b2 == 17:  # pop
                if istack:
                    args.append(istack.pop())
            elif b2 == 33:  # setcurrentpoint
                if len(args) >= 2:
                    y = args.pop(); x = args.pop()
                    box.cur_x = x; box.cur_y = y
                    box.mark((x, y))
        elif byte == 13:  # hsbw
            if len(args) >= 2:
                args.pop()  # wx
                sbx = args.pop()
                box.cur_x = sbx
                box.cur_y = 0
                box.mark((sbx, 0))
        elif byte == 21:  # rmoveto
            if len(args) >= 2:
                dy = args.pop(); dx = args.pop()
                box.cur_x += dx; box.cur_y += dy
                box.mark((box.cur_x, box.cur_y))
        elif byte == 22:  # hmoveto
            if args:
                box.cur_x += args.pop()
                if box.cur_x < box.left:
                    box.left = box.cur_x
                if box.cur_x > box.right:
                    box.right = box.cur_x
        elif byte == 30:  # vhcurveto
            if len(args) >= 4:
                dx3 = args.pop(); dy2 = args.pop()
                dx2 = args.pop(); dy1 = args.pop()
                x1 = box.cur_x; y1 = box.cur_y + dy1
                x2 = x1 + dx2; y2 = y1 + dy2
                x3 = x2 + dx3; y3 = y2
                box.cur_x = x3; box.cur_y = y3
                box.mark((x1, y1), (x2, y2), (x3, y3))
        elif byte == 31:  # hvcurveto
            if len(args) >= 4:
                dy3 = args.pop(); dy2 = args.pop()
                dx2 = args.pop(); dx1 = args.pop()
                x1 = box.cur_x + dx1; y1 = box.cur_y
                x2 = x1 + dx2; y2 = y1 + dy2
                x3 = x2; y3 = y2 + dy3
                box.cur_x = x3; box.cur_y = y3
                box.mark((x1, y1), (x2, y2), (x3, y3))
        # 0 error / 9 closepath / 11 return / 14 endchar: no-ops
        t += 1


_SUBR_RX = re.compile(rb"dup\s(\d+)\s(\d+)\sRD\s")
_CHARSTRING_RX = re.compile(rb"/(\S+)\s+(\d+)\sRD\s")


def _iter_rd_entries(blob: bytes, rx: re.Pattern):
    """Sequentially frame `<prefix> <n> RD <n bytes>` entries: after each
    match the scan resumes PAST the declared byte count, so patterns that
    happen to occur inside the encrypted binary payload can never
    fabricate phantom entries or mis-frame later ones.  (The reference
    regex-iterates the whole blob, …cpp:411-419/444-451, which can match
    inside charstring bytes; sequential framing agrees with it on every
    correctly-framed font and is strictly safer on adversarial bytes.)"""
    pos = 0
    while True:
        m = rx.search(blob, pos)
        if m is None:
            return
        nbytes = int(m.group(2))
        payload = blob[m.end():m.end() + nbytes]
        yield m, payload
        pos = m.end() + nbytes


def parse_type1(data: bytes) -> Optional[dict]:
    """Parse a Type 1 font program: returns {font_matrix, is_italic,
    weight, glyph_bboxes} or None when the body is unreadable.

    Layout handling mirrors the reference (…cpp:191-242, 314-381): PFB
    0x80-segment framing for both parts, hex (PFA) vs binary body
    sniffing on the first four body characters."""
    # weight None = no /Weight entry in the program (caller keeps the
    # wire-encoded weight)
    info = {"font_matrix": (0.001, 0.0, 0.0, 0.001, 0.0, 0.0),
            "is_italic": False, "weight": None,
            "glyph_bboxes": {}}

    pos = 0
    if data[:2] == b"\x80\x01":  # PFB cleartext segment header
        length1 = int.from_bytes(data[2:6], "little")
        pos = 6
    else:
        eexec = data.find(b"eexec")
        if eexec == -1:
            return None
        length1 = eexec + len(b"eexec")
        # the eexec keyword is followed by a newline that belongs to the
        # cleartext portion
        while length1 < len(data) and data[length1] in b"\r\n \t":
            length1 += 1
    ascii_part = data[pos:pos + length1]
    _parse_ascii_part(ascii_part.decode("latin-1"), info)
    body = data[pos + length1:]

    # PFB binary-body segment header
    if body[:2] == b"\x80\x02":
        blen = int.from_bytes(body[2:6], "little")
        body = body[6:6 + blen]
    if len(body) < 4:
        return None
    # hex (PFA) vs binary: the reference sniffs the first four chars
    is_hex = all(chr(c) in "0123456789abcdefABCDEF" for c in body[:4])
    if is_hex:
        hex_bytes = bytes(c for c in body
                          if chr(c) in "0123456789abcdefABCDEF")
        if len(hex_bytes) % 2:
            hex_bytes = hex_bytes[:-1]
        body = bytes.fromhex(hex_bytes.decode("ascii"))

    decrypted = decrypt(body, 55665, 4)

    len_iv = 4
    m = re.search(rb"/lenIV\s+(\d+)", decrypted)
    if m:
        len_iv = int(m.group(1))

    # /Subrs is OPTIONAL per the Type 1 spec: a missing array just means
    # no subroutines (the reference bails out here, …cpp:397-401, losing
    # the whole font; parsing on is a strict improvement and only
    # diverges on fonts the reference rejects entirely)
    subrs: Dict[int, bytes] = {}
    cs_start = decrypted.find(b"/CharStrings")
    sub_start = decrypted.find(b"/Subrs")
    if sub_start != -1:
        sub_blob = decrypted[sub_start:
                             cs_start if cs_start != -1 else len(decrypted)]
        for m, enc in _iter_rd_entries(sub_blob, _SUBR_RX):
            subrs[int(m.group(1))] = decrypt(enc, 4330, len_iv)

    if cs_start == -1:
        return None
    charstrings = decrypted[cs_start + 12:]
    for m, enc in _iter_rd_entries(charstrings, _CHARSTRING_RX):
        name = m.group(1).decode("latin-1")
        cs = decrypt(enc, 4330, len_iv)
        box = _Box()
        _run_charstring(cs, subrs, box, [], [])
        info["glyph_bboxes"][name] = (float(box.left), float(box.upper),
                                      float(box.right), float(box.lower))
    return info


# ---------------------------------------------------------------------------
# synthetic Type 1 builder (test fixtures / payload v4 corpus)
# ---------------------------------------------------------------------------

def _encode_num(v: int) -> bytes:
    """Charstring integer encoding (Adobe Type 1 spec §6.2)."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 0xFF])
    return b"\xff" + (v & 0xFFFFFFFF).to_bytes(4, "big")


def build_charstring_for_bbox(lx: int, uy: int, rx: int, ly: int) -> bytes:
    """Plaintext charstring whose interpreter-traced bbox is EXACTLY
    (lx, uy, rx, ly): sbw to (lx, uy), one rlineto to (rx, ly), endchar."""
    return (_encode_num(lx) + _encode_num(uy) + _encode_num(rx)
            + _encode_num(0) + b"\x0c\x07"          # sbw
            + _encode_num(rx - lx) + _encode_num(ly - uy) + b"\x05"  # rlineto
            + b"\x0e")                               # endchar


def build_type1_program(glyph_charstrings: Dict[str, bytes],
                        font_matrix: Tuple[float, ...] = (0.001, 0.0, 0.0,
                                                          0.001, 0.0, 0.0),
                        weight_name: str = "Regular",
                        italic_angle: int = 0,
                        subrs: Optional[Dict[int, bytes]] = None,
                        hex_body: bool = False) -> bytes:
    """Assemble a parseable Type 1 font program: cleartext header (the
    fields parseAsciiPart reads) + eexec-encrypted body with /Subrs and
    /CharStrings in the reference's RD layout."""
    header = (
        "%!FontType1-1.0: SyntheticTestFont\n"
        "/FontMatrix [{matrix} ]readonly def\n"
        "/ItalicAngle {angle} def\n"
        "/Weight ({weight}) def\n"
        "currentdict end\n"
        "currentfile eexec\n"
        .format(matrix=" ".join("%g" % v for v in font_matrix),
                angle=italic_angle,
                weight=weight_name)).encode("latin-1")

    body_parts = [b"dup /Private 8 dict dup begin\n/lenIV 4 def\n/Subrs %d array\n"
                  % len(subrs or {})]
    for idx, plain in sorted((subrs or {}).items()):
        enc = encrypt(plain, 4330, 4)
        body_parts.append(b"dup %d %d RD " % (idx, len(enc)))
        body_parts.append(enc)
        body_parts.append(b" NP\n")
    body_parts.append(b"ND\n")
    body_parts.append(b"/CharStrings %d dict dup begin\n"
                      % len(glyph_charstrings))
    for name, plain in glyph_charstrings.items():
        enc = encrypt(plain, 4330, 4)
        body_parts.append(b"/%s %d RD " % (name.encode("latin-1"), len(enc)))
        body_parts.append(enc)
        body_parts.append(b" ND\n")
    body_parts.append(b"end\nend\n")
    body = encrypt(b"".join(body_parts), 55665, 4)
    if hex_body:
        body = body.hex().encode("ascii")
    return header + body
