"""Issued-op accounting for every shipped raster kernel (KERNELS.md).

For each kernel family this script derives, from the SAME pack/dispatch
code the engine runs, the number of (primitive, pixel) work items a
reference workload issues — including every padding term the partition
scheme introduces (chunk quantization, register-tile max, window rows,
bucket caps) — prices them with the per-pair op counts of the kernel
float programs, and divides by the measured device times recorded in
docs/RESULTS.md to yield effective Top/s against the measured
3.41 Top/s cmp/select/add VPU roofline (tools/tpu_probes/
tpu_roofline.py).

Run on the HOST (no TPU needed): python tools/op_accounting.py
The printed table is pasted into docs/KERNELS.md; measured times are
pinned here with their RESULTS.md provenance so the derivation is
reproducible.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

ROOFLINE_TOPS = 3.41  # measured cmp/select/add pattern peak

# Per-(primitive, pixel) issued-op estimates, counted from the kernel
# float programs (ops = VPU lane-ops; an FMA counts 1):
#
# winding phase B (v2/dense/page/window kernels share it,
# kernels/winding_pallas_v2.py): per (segment, pixel) the x-polynomial
# eval + two root compares + guarded adds ≈ 2 cmp + 2 select + 2 FMA
# + 2 add = 8 ops per root pair slot.
WINDING_OPS_PER_PAIR = 8
# winding phase A (root solve per segment ROW-INDEPENDENT work is
# amortized over pixels; per (segment, row): quadratic solve ≈ 30 ops
WINDING_PHASE_A_PER_SEG_ROW = 30
# SDF Newton (kernels/sdf_pallas.py _make_sdf_kernel): dist_sq at the
# two endpoints (2 x 10) + 3 starts x (3 Newton iters x 14 + dist_sq
# 10 + clip 2) + min folds ≈ 180 ops per (segment, pixel).
SDF_OPS_PER_PAIR = 180
# Loop-Blinn (kernels/loopblinn.py): per (triangle, pixel) 3 edge
# functions + class select + implicit eval ≈ 22 ops.
LB_OPS_PER_PAIR = 22
# coverage fused x-pair page kernel: winding phase B x samples with
# shared roots; per (segment, pixel, sample) ≈ 8 (same pattern).


def cjk_batch(b=1000, s=288):
    from benchmarks.cjk import make_batch

    return make_batch(b, s)


def _fmt(name, work_desc, ops, ms, note=""):
    tops = ops / (ms * 1e-3) / 1e12
    util = 100.0 * tops / ROOFLINE_TOPS
    print(f"| {name} | {work_desc} | {ops/1e9:.1f} G | {ms:.2f} | "
          f"{tops:.2f} | {util:.0f}% | {note} |")


def main():
    print("| kernel / workload | issued work (incl. padding) | ops | "
          "measured ms | eff Top/s | of roofline | note |")
    print("|---|---|---|---|---|---|---|")

    # ---- flagship v2 gg16: headline 94 @256 ---------------------------
    # measured 0.752 ms (RESULTS.md round-4 window packing table).
    # work: 94 glyphs x capacity 64 segs (padded) x 256x256 px, group
    # guard elides ~55% of groups (RESULTS: "~45% group activity").
    px = 256 * 256
    pairs = 94 * 64 * px * 0.45
    ops = pairs * WINDING_OPS_PER_PAIR \
        + 94 * 64 * 256 * WINDING_PHASE_A_PER_SEG_ROW
    _fmt("winding v2 gg16 / headline 94@256", "94 x 64 segs x 64Kpx x "
         "45% live groups", ops, 0.752,
         "phase-B pattern == the roofline microbench")

    # ---- dense x-sorted + row windows: CJK @64 ------------------------
    # measured 2.4 ms @32 / 4.8 ms @64 (ROADMAP round-4 session A/B).
    # work: per-chunk row windows cull to the rows each 8-seg chunk's
    # hull spans; derive the kept (seg, px) count from the shipped
    # pack (pack_dense_windows).
    from fontrx.kernels.winding_dense import pack_dense_windows

    segs = cjk_batch()
    for size, ms in ((32, 2.4), (64, 4.8)):
        scale = np.float32(size / 2048.0)
        _stream, n_windows, cap = pack_dense_windows(
            segs, np.zeros(len(segs), np.int32),
            np.full(len(segs), size - 1, np.int32), float(scale),
            size)
        # the kernel dispatches the global rounded cap per window:
        # that IS the issued work (padding included)
        kept_pairs = len(segs) * n_windows * cap * min(16, size) * size
        ops = kept_pairs * WINDING_OPS_PER_PAIR \
            + len(segs) * n_windows * cap * WINDING_PHASE_A_PER_SEG_ROW
        _fmt(f"dense x-sort windows / CJK @{size}",
             f"{n_windows} win x cap {cap} x {min(16, size)} rows",
             ops, ms, "cap from the shipped pack (x-cull not credited)")

    # ---- page dynamic-defer: 4K stress --------------------------------
    # measured ~20 ms device (RESULTS round-3 close).  140,798 live
    # segments; each chunk touches 1-2 tiles x 8 rows; defer carries.
    # Upper bound: live segs x 128-lane tile x 8 strip rows.
    pairs = 140798 * 128 * 8 * 1.5
    ops = pairs * WINDING_OPS_PER_PAIR
    _fmt("page dynamic-defer / 4K 140k segs", "1.5 tiles avg x 8 rows",
         ops, 20.0, "tile count from the dynamic x-hull windows")

    # ---- Loop-Blinn 128 / config 3 ------------------------------------
    # measured 1.40 ms for the 70-glyph ASCII batch (round-3 close),
    # capacity-padded triangles.
    from fontrx.geometry import TriangulatedGlyph
    from fontrx.font.font import Font

    font = Font.open(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    caps = []
    for c in range(0x21, 0x7F):
        try:
            g, _ = font.get_glyph(chr(c))
            if not g.num_segments:
                continue
            t = TriangulatedGlyph.from_glyph(g)
            if len(t.triangles):
                caps.append(len(t.triangles))
        except Exception:
            pass
    lcap = max(caps)
    pairs = len(caps) * lcap * 128 * 128
    ops = pairs * LB_OPS_PER_PAIR
    _fmt("loop-blinn 128x32 / ASCII @128",
         f"{len(caps)} glyphs x cap {lcap} tris x 16Kpx", ops, 1.40,
         "bbox cull not credited (upper bound)")

    # ---- SDF flat / CJK @64 -------------------------------------------
    # measured 133.0 ms (round-5 probe, tools/tpu_probes/tpu_sdf_tiled2)
    pairs = 1000 * 288 * 64 * 64
    ops = pairs * SDF_OPS_PER_PAIR
    _fmt("SDF flat / CJK @64", "every (seg, px) pair", ops, 133.0,
         "no cull by construction")

    # ---- SDF tiled band-culled / CJK @64 ------------------------------
    # measured 92.1 ms (4x32, chunk 16, sorted binning, same probe).
    from fontrx.kernels.sdf_pallas import pack_sdf_tiles

    _, cnts, _, cap = pack_sdf_tiles(
        segs, np.zeros(len(segs), np.int32),
        np.full(len(segs), 63, np.int32), np.float32(64 / 2048.0),
        64, 64, tile_h=4, tile_w=32, seg_chunk=16, x_slack_px=4.0,
        sort_tiles=True)
    iters = int(np.sum(cnts))
    pairs = iters * 16 * 1024  # chunk segs x register-tile px
    ops = pairs * SDF_OPS_PER_PAIR
    _fmt("SDF tiled 4x32 c16 sorted / CJK @64",
         f"{iters} chunk-iters (packed, incl. quantization)", ops,
         92.1, "chunk iters derived from the shipped pack")


if __name__ == "__main__":
    main()
