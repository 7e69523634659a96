"""Extract the RFC 6386 normative probability/quantizer tables from the
system's public libwebp binary into ``operators/vp8_tables.py``.

Why extraction instead of transcription: the VP8 keyframe decoder needs
four large normative constant tables from RFC 6386 ("VP8 Data Format and
Decoding Guide", §13-14) — the default token probabilities (4x8x3x11),
the token-probability update flags' probabilities (4x8x3x11), the
keyframe B-mode probabilities (10x10x9), and the two quantizer lookup
tables (128 each). Hand-transcribing ~3,000 numbers invites silent
corruption; the system ships libwebp (BSD-licensed reference
implementation, /usr/lib/x86_64-linux-gnu/libwebp.so.7), whose .rodata
embeds exactly these constants. This tool locates them by byte-pattern
anchors, sanity-checks the structure, and writes a generated module.

The extraction is VALIDATED FUNCTIONALLY, not just by anchors:
tests/test_vp8.py encodes random images with libwebp's own encoder and
asserts the from-scratch decoder reproduces libwebp's decoded YUV planes
bit-for-bit — a single wrong table byte desynchronizes the arithmetic
decoder and fails those tests catastrophically, so green tests prove the
extracted tables are the reference implementation's (i.e. the RFC's).

Anchor provenance (all public knowledge, RFC 6386):
  * dc_qlookup starts 4,5,6,7,8,9,10,10,11,... and ends ...154,157 (§14.1)
  * ac_qlookup is uint16 4..284 (§14.1)
  * coefficient bands are 0,1,2,3,6,4,5,6,...,7 (§13.3)
  * default_coeff_probs[0][1][0] = 253,136,254,255,228,219,128...
    (§13.5; band 0 of type 0 is three all-128 dummy rows before it)
  * kf_bmode_prob[0][0] = 231,120,48,89,115,113,120,152,112 (§11.5)
  * zigzag = 0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15 (§14.4)

Usage: python tools/extract_vp8_tables.py [path-to-libwebp.so]
Writes json_time_series_extractor_spark/operators/vp8_tables.py
(committed; regenerating is deterministic for a given library build).
"""

from __future__ import annotations

import struct
import sys

LIB_DEFAULT = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"

DC_HEAD = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17])
DC_TAIL = bytes([138, 140, 143, 145, 148, 151, 154, 157])
BANDS = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])
COEF_ROW0 = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
BMODE_ROW0 = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
ZIGZAG = bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
CAT6 = bytes([254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129])


def _find_once(data: bytes, pat: bytes, label: str, which: int = 0) -> int:
    """Offset of occurrence `which` of `pat` (the decoder copy comes
    first in this build; the encoder carries duplicates later)."""
    hits = []
    start = 0
    while True:
        i = data.find(pat, start)
        if i < 0:
            break
        hits.append(i)
        start = i + 1
    if not hits:
        raise SystemExit(f"anchor not found: {label}")
    if which >= len(hits):
        raise SystemExit(f"anchor {label}: wanted occurrence {which}, "
                         f"found {len(hits)}")
    return hits[which]


def extract(lib_path: str) -> dict:
    data = open(lib_path, "rb").read()

    dc_off = _find_once(data, DC_HEAD, "dc_qlookup head")
    dc = list(data[dc_off:dc_off + 128])
    if bytes(dc[-8:]) != DC_TAIL:
        raise SystemExit("dc_qlookup tail mismatch — layout changed")

    # ac_qlookup: uint16[128], located immediately before dc_qlookup in
    # this build; verify by value shape instead of trusting adjacency.
    ac_off = dc_off - 256
    ac = list(struct.unpack_from("<128H", data, ac_off))
    if ac[:8] != [4, 5, 6, 7, 8, 9, 10, 11] or ac[-1] != 284:
        raise SystemExit("ac_qlookup shape mismatch — layout changed")

    bands_off = _find_once(data, BANDS, "coeff bands")
    if bands_off != dc_off + 128:
        raise SystemExit("band table not adjacent to dc_qlookup — "
                         "layout changed")

    # CoeffsUpdateProba [4][8][3][11]: follows the (padded) band table
    # and runs up to kBModesProba; mostly 255s.
    bmode_off = _find_once(data, BMODE_ROW0, "kf_bmode row0")
    upd_off = bmode_off - 1056
    upd = list(data[upd_off:upd_off + 1056])
    if min(upd) < 1 or upd[:11] != [255] * 11:
        raise SystemExit("update-prob table shape mismatch")

    bmode = list(data[bmode_off:bmode_off + 900])
    if min(bmode) < 1:
        raise SystemExit("kf_bmode prob of 0 — layout changed")
    # The library's internal B-mode enum permutes the RFC's: it numbers
    # RD=4, VR=5, LD=6, VL=7 where RFC 6386 §11.2 numbers LD=4, RD=5,
    # VR=6, VL=7. The table's two context axes (above-mode, left-mode)
    # follow the library numbering; permute both axes so the committed
    # table is indexed by RFC mode numbers (which the decoder uses).
    # Verified functionally: without this permutation the bit-exact
    # cross-checks fail on any B_PRED macroblock whose neighbor mode is
    # in {LD, RD, VR}.
    rfc_to_lib = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]
    bmode_nested = [[[bmode[(rfc_to_lib[a] * 10 + rfc_to_lib[l]) * 9 + p]
                     for p in range(9)]
                    for l in range(10)] for a in range(10)]

    # The anchor row is [0][1][0]: band 0 of type 0 is three all-128
    # dummy rows (33 bytes) that precede it.
    coef_off = _find_once(data, COEF_ROW0, "default coeff probs row0") - 33
    coef = list(data[coef_off:coef_off + 1056])
    if coef[:33] != [128] * 33 or min(coef) < 1:
        raise SystemExit("coeff prob table shape mismatch — layout "
                         "changed")

    zz_off = _find_once(data, ZIGZAG, "zigzag")
    cat6_off = _find_once(data, CAT6, "cat6 probs")
    if cat6_off != zz_off + 16:
        raise SystemExit("cat6 not adjacent to zigzag — layout changed")

    def nest(flat, dims):
        if len(dims) == 1:
            return list(flat)
        n = len(flat) // dims[0]
        return [nest(flat[i * n:(i + 1) * n], dims[1:])
                for i in range(dims[0])]

    return {
        "dc_qlookup": dc,
        "ac_qlookup": ac,
        "coeff_bands": list(BANDS),
        "coeff_update_probs": nest(upd, (4, 8, 3, 11)),
        "default_coeff_probs": nest(coef, (4, 8, 3, 11)),
        "kf_bmode_probs": bmode_nested,
        "zigzag": list(ZIGZAG),
    }


def main() -> None:
    lib = sys.argv[1] if len(sys.argv) > 1 else LIB_DEFAULT
    t = extract(lib)
    lines = [
        '"""GENERATED by tools/extract_vp8_tables.py — do not edit.',
        "",
        "RFC 6386 normative constant tables for the VP8 keyframe decoder,",
        f"extracted from the public reference implementation binary",
        f"({lib}) and functionally validated by the bit-exact",
        "decoder-vs-libwebp cross-checks in tests/test_vp8.py (see the",
        'extractor docstring for the validation argument)."""',
        "",
    ]
    for name, val in t.items():
        lines.append(f"{name.upper()} = {val!r}")
        lines.append("")
    out = ("json_time_series_extractor_spark/operators/vp8_tables.py")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    sizes = {k: (len(v) if not isinstance(v[0], list) else "nested")
             for k, v in t.items()}
    print(f"wrote {out}: {sizes}")


if __name__ == "__main__":
    main()
