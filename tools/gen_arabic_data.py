"""Regenerate fontrx/font/_arabic_data.py from the system ICU's
UCHAR_JOINING_TYPE property (the ArabicShaping.txt data, which this
environment doesn't ship as a UCD file).  Dev-time tool; the vendored
table is what the Arabic shaper consumes at runtime."""

import ctypes

from fontrx.native.icu import symbol

get = symbol("u_getIntPropertyValue")
get.restype = ctypes.c_int32
get.argtypes = [ctypes.c_int32, ctypes.c_int]
JT = ["U", "C", "D", "L", "R", "T"]
UCHAR_JOINING_TYPE = 0x1007

SWEEP = sorted(set(range(0x0600, 0x0900)) | {0x200C, 0x200D}
               | set(range(0x0700, 0x0780)) | set(range(0xA840, 0xA878)))

out_ranges = []
prev_cp = prev_t = None
start = None
for cp in SWEEP:
    t = JT[get(cp, UCHAR_JOINING_TYPE)]
    if t == "U":
        t = None
    if t != prev_t or (prev_cp is not None and cp != prev_cp + 1):
        if prev_t is not None:
            out_ranges.append((start, prev_cp, prev_t))
        start = cp
    prev_cp, prev_t = cp, t
if prev_t is not None:
    out_ranges.append((start, prev_cp, prev_t))

lines = ['"""Arabic/Syriac joining types (ArabicShaping semantics),',
         'GENERATED from the system ICU UCHAR_JOINING_TYPE property',
         '(tools/gen_arabic_data.py regenerates).  Characters outside',
         'every range are non-joining (U).  Types: C join-causing,',
         'D dual, L left, R right, T transparent."""',
         '',
         'JOINING_RANGES = (']
for lo, hi, t in out_ranges:
    lines.append(f'    (0x{lo:04X}, 0x{hi:04X}, "{t}"),')
lines += [')', '', '',
          'def joining_type(cp: int) -> str:',
          '    """ArabicShaping joining type of one codepoint."""',
          '    for lo, hi, t in JOINING_RANGES:',
          '        if lo <= cp <= hi:',
          '            return t',
          '        if cp < lo:',
          '            break',
          '    return "U"']
with open("fontrx/font/_arabic_data.py", "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {len(out_ranges)} ranges")
