"""Generate ``fontrx/font/_uax14_data.py`` — UAX#14 Line_Break
classes from the system ICU's UCHAR_LINE_BREAK property (the
LineBreak.txt data; ICU 72 carries Unicode 15.0).

LB1 class resolution is baked in at generation time:

- AI, SG, XX  -> AL
- SA          -> CM when General_Category is Mn/Mc, else AL
- CJ          -> NS  (the default, non-strict tailoring UAX#14
                 specifies for plain text and ICU root applies)

so the runtime table contains only resolved classes.

Run: ``python tools/gen_uax14_data.py`` (rewrites the module).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from fontrx.native.icu import symbol  # noqa: E402

import ctypes  # noqa: E402

get = symbol("u_getIntPropertyValue")
get.restype = ctypes.c_int32
get.argtypes = [ctypes.c_int32, ctypes.c_int32]
chartype = symbol("u_charType")
chartype.restype = ctypes.c_int8
chartype.argtypes = [ctypes.c_int32]
hasbin = symbol("u_hasBinaryProperty")
hasbin.restype = ctypes.c_int8  # UBool — without this ctypes reads a
hasbin.argtypes = [ctypes.c_int32, ctypes.c_int32]  # garbage-truthy int

UCHAR_LINE_BREAK = 0x1008
UCHAR_EAST_ASIAN_WIDTH = 0x1004
UCHAR_EXTENDED_PICTOGRAPHIC = 64
EA_FWH = (2, 3, 5)  # Halfwidth, Fullwidth, Wide

# ICU ULineBreak enum order (stable ABI order, icu/uchar.h)
ICU_LB = [
    "XX", "AI", "AL", "B2", "BA", "BB", "BK", "CB", "CL", "CM",
    "CR", "EX", "GL", "HY", "ID", "IN", "IS", "LF", "NS", "NU",
    "OP", "PO", "PR", "QU", "SA", "SG", "SP", "SY", "ZW", "NL",
    "WJ", "H2", "H3", "JL", "JT", "JV", "CP", "CJ", "HL", "RI",
    "EB", "EM", "ZWJ", "AK", "AP", "AS", "VF", "VI",
]
# ICU UCharCategory: Mn = 6, Mc = 8
GC_MN, GC_MC = 6, 8


def resolved_class(cp: int) -> str:
    c = ICU_LB[get(cp, UCHAR_LINE_BREAK)]
    if c in ("AI", "SG", "XX"):
        return "AL"
    if c == "SA":
        return "CM" if chartype(cp) in (GC_MN, GC_MC) else "AL"
    if c == "CJ":
        return "NS"
    return c


def main(out: str) -> None:
    ranges = []
    cur_cls = resolved_class(0)
    start = 0
    for cp in range(1, 0x110000):
        c = resolved_class(cp)
        if c != cur_cls:
            ranges.append((start, cp - 1, cur_cls))
            start, cur_cls = cp, c
    ranges.append((start, 0x10FFFF, cur_cls))

    classes = sorted({c for _, _, c in ranges})
    cls_id = {c: i for i, c in enumerate(classes)}

    # LB30's OP/CP exclusion: East_Asian_Width F, W, or H
    eaw_opcp = []
    for s, e, c in ranges:
        if c not in ("OP", "CP"):
            continue
        for cp in range(s, e + 1):
            if get(cp, UCHAR_EAST_ASIAN_WIDTH) in EA_FWH:
                eaw_opcp.append(cp)

    # LB30b's unassigned Extended_Pictographic (treated as EB bases)
    extpict_cn = []
    start_cn = None
    for cp in range(0x110001):
        isep = (cp <= 0x10FFFF
                and hasbin(cp, UCHAR_EXTENDED_PICTOGRAPHIC)
                and chartype(cp) == 0)
        if isep and start_cn is None:
            start_cn = cp
        elif not isep and start_cn is not None:
            extpict_cn.append((start_cn, cp - 1))
            start_cn = None

    with open(out, "w") as f:
        f.write('"""UAX#14 Line_Break classes (LB1-resolved), '
                "GENERATED from the\nsystem ICU UCHAR_LINE_BREAK "
                'property (tools/gen_uax14_data.py).\n"""\n\n')
        f.write("CLASSES = %r\n\n" % (tuple(classes),))
        f.write("# (start, end, class-id) half-open-free inclusive "
                "ranges, sorted\n")
        f.write("LB_STARTS = (\n")
        for s, _, _ in ranges:
            f.write("    0x%04X,\n" % s)
        f.write(")\n\nLB_IDS = (\n")
        for _, _, c in ranges:
            f.write("    %d,  # %s\n" % (cls_id[c], c))
        f.write(")\n\n")
        f.write("# OP/CP codepoints with East_Asian_Width F/W/H "
                "(excluded from LB30)\n")
        f.write("LB30_EAW_OPCP = frozenset((\n")
        for cp in eaw_opcp:
            f.write("    0x%04X,\n" % cp)
        f.write("))\n\n")
        f.write("# Extended_Pictographic & Cn ranges "
                "(LB30b EB-base rule)\n")
        f.write("EXTPICT_CN = (\n")
        for s, e in extpict_cn:
            f.write("    (0x%04X, 0x%04X),\n" % (s, e))
        f.write(")\n")
    print("wrote", out, ":", len(ranges), "ranges,",
          len(classes), "classes,", len(eaw_opcp), "eaw op/cp,",
          len(extpict_cn), "extpict-cn ranges")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "fontrx/font/_uax14_data.py")
