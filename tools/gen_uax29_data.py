"""Generate ``fontrx/font/_uax29_data.py`` — UAX#29
Grapheme_Cluster_Break classes plus Extended_Pictographic ranges from
the system ICU (GraphemeBreakProperty.txt / emoji-data.txt
equivalents; ICU 72 carries Unicode 15.0).

Run: ``python tools/gen_uax29_data.py`` (rewrites the module).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from fontrx.native.icu import symbol  # noqa: E402

import ctypes  # noqa: E402

get = symbol("u_getIntPropertyValue")
get.restype = ctypes.c_int32
get.argtypes = [ctypes.c_int32, ctypes.c_int32]
hasbin = symbol("u_hasBinaryProperty")
hasbin.restype = ctypes.c_int8  # UBool — without this ctypes reads a
hasbin.argtypes = [ctypes.c_int32, ctypes.c_int32]  # garbage-truthy int

UCHAR_GRAPHEME_CLUSTER_BREAK = 0x1012
UCHAR_EXTENDED_PICTOGRAPHIC = 64

# ICU UGraphemeClusterBreak enum order (uchar.h, stable ABI)
ICU_GCB = [
    "XX", "CN", "CR", "EX", "L", "LF", "LV", "LVT", "T", "V",
    "SM", "PP", "RI", "EB", "EBG", "EM", "GAZ", "ZWJ",
]


def main(out: str) -> None:
    ranges = []
    cur = ICU_GCB[get(0, UCHAR_GRAPHEME_CLUSTER_BREAK)]
    start = 0
    for cp in range(1, 0x110000):
        c = ICU_GCB[get(cp, UCHAR_GRAPHEME_CLUSTER_BREAK)]
        if c != cur:
            ranges.append((start, cp - 1, cur))
            start, cur = cp, c
    ranges.append((start, 0x10FFFF, cur))

    extpict = []
    s = None
    for cp in range(0x110001):
        isep = cp <= 0x10FFFF and bool(
            hasbin(cp, UCHAR_EXTENDED_PICTOGRAPHIC))
        if isep and s is None:
            s = cp
        elif not isep and s is not None:
            extpict.append((s, cp - 1))
            s = None

    classes = sorted({c for _, _, c in ranges})
    cls_id = {c: i for i, c in enumerate(classes)}
    with open(out, "w") as f:
        f.write('"""UAX#29 Grapheme_Cluster_Break classes + '
                "Extended_Pictographic,\nGENERATED from the system ICU "
                '(tools/gen_uax29_data.py).\n"""\n\n')
        f.write("CLASSES = %r\n\n" % (tuple(classes),))
        f.write("GCB_STARTS = (\n")
        for st, _, _ in ranges:
            f.write("    0x%04X,\n" % st)
        f.write(")\n\nGCB_IDS = (\n")
        for _, _, c in ranges:
            f.write("    %d,  # %s\n" % (cls_id[c], c))
        f.write(")\n\nEXTPICT = (\n")
        for a, b in extpict:
            f.write("    (0x%04X, 0x%04X),\n" % (a, b))
        f.write(")\n")
    print("wrote", out, ":", len(ranges), "ranges,", len(classes),
          "classes,", len(extpict), "extpict ranges")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "fontrx/font/_uax29_data.py")
