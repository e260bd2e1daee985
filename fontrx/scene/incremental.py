"""Incremental paragraph-cached layout for the interactive edit loop.

The reference re-lays the whole scene per typed character (its
``addChar`` pipeline, ``Appli.zig:318-351``, runs per char with no
cache beyond glyph dedup).  fontrx's full :func:`layout_text` on a
10k-char page with full GPOS costs ~200 ms host-side — far off the
60 fps edit budget.  This module makes an edit O(changed paragraph):

- Hard-``\\n`` paragraphs lay out INDEPENDENTLY by construction:
  shaping streams, ligatures, kerning, GPOS positioning, UAX#14
  wrapping, bidi level resolution and justification are all
  line-local in ``layout_text`` (ligatures never cross newlines;
  ``pen_y = -line_no * line_height`` is the only cross-line
  coupling).
- Each paragraph's solo ``TextLayout`` is cached (LRU, keyed by the
  paragraph text + the font's variable-axis location).
- The page layout is an EXACT merge: glyph slots re-deduped in
  first-seen paragraph order (reproducing the full layout's
  ``slot_of`` insertion order), ``PackedBatch`` rows copied (the
  per-glyph padded segment rows are deterministic per gid), and
  instance ``y`` shifted by the paragraph's first visual line index
  times the line height — exact float arithmetic when the line
  height is integral (hhea metrics are font-unit integers), which is
  gated.

Bit-identity contract: ``merge(solo paragraph layouts) ==
layout_text(full text)`` field-for-field — ``tests/test_incremental.py``
asserts exact array equality over the option matrix.  Unsupported
option combinations (vertical layout, decoration bars, fractional
line heights, ``pad_batch_to``) fall back to one full
``layout_text`` call, so callers never need to special-case.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from fontrx.pack.segments import PackedBatch
from fontrx.scene.layout import LazyInstances, TextLayout, layout_text

__all__ = ["IncrementalLayoutEngine"]


class IncrementalLayoutEngine:
    """Paragraph-cached :func:`layout_text` with an exact merge.

    One engine instance corresponds to one (font, layout-options)
    pair — the same contract as repeated ``layout_text(font, text,
    **options)`` calls, which it reproduces bit-identically (or
    literally, on the fallback path).
    """

    def __init__(self, font, cache_size: int = 512, **options):
        self.font = font
        self.options = dict(options)
        self.cache_size = cache_size
        self._cache: OrderedDict[tuple, tuple] = OrderedDict()
        self._seq = 0            # per-entry token (id() reuse is unsafe)
        self._last_spans = None  # [(token, base, n_lines)] of last layout
        self._prev_spans = None  # baseline for consume_dirty_lines
        # merge requires: horizontal, no synthetic decoration slots
        # (they append geometry-keyed extra gids AFTER all lines, so a
        # per-paragraph merge would interleave them), no batch padding
        self._mergeable = not (
            options.get("vertical")
            or options.get("underline")
            or options.get("strikethrough")
            or options.get("pad_batch_to") is not None
        )

    # -- resolved line height (must mirror layout_text exactly) ----------

    def _line_height(self):
        lh = self.options.get("line_height")
        if lh is not None:
            return lh
        font = self.font
        if hasattr(font, "varied_metric"):
            return (
                font.varied_metric(b"hasc", font.info.ascent)
                - font.varied_metric(b"hdsc", font.info.descent)
                + font.varied_metric(b"hlgp", font.info.line_gap)
            )
        return font.info.ascent - font.info.descent + font.info.line_gap

    def _var_key(self) -> tuple:
        loc = getattr(self.font, "_var_user", None) or {}
        return tuple(sorted(loc.items()))

    # -- public ----------------------------------------------------------

    def layout(self, text: str) -> TextLayout:
        lh = self._line_height()
        if (not self._mergeable or float(lh) <= 0.0
                or not float(lh).is_integer()):
            self._last_spans = None
            return layout_text(self.font, text, **self.options)
        paras = text.split("\n")
        vk = self._var_key()
        solos = [self._solo(p, vk) for p in paras]
        return self._merge(solos, lh)

    def consume_dirty_lines(self):
        """Visual-line span changed by the LAST :meth:`layout` call
        relative to the one before it, as a half-open ``(l0, l1)`` —
        or ``None`` when unknown (first call, fallback path, or var
        change), meaning everything must be treated dirty.  A clean
        paragraph is one whose solo layout is the SAME cached object
        at the SAME first visual line; spans cover the union of old
        and new line ranges so deletions/insertions dirty everything
        they shifted.  Consuming resets the baseline to the last
        layout, so each edit reports only its own span."""
        prev, cur = self._prev_spans, self._last_spans
        self._prev_spans = cur
        if prev is None or cur is None:
            return None
        lo, hi = None, None

        def mark(a, b):
            nonlocal lo, hi
            lo = a if lo is None else min(lo, a)
            hi = b if hi is None else max(hi, b)

        n = max(len(prev), len(cur))
        for k in range(n):
            if k >= len(prev):
                mark(cur[k][1], cur[k][1] + cur[k][2])
            elif k >= len(cur):
                mark(prev[k][1], prev[k][1] + prev[k][2])
            elif prev[k] != cur[k]:
                mark(min(prev[k][1], cur[k][1]),
                     max(prev[k][1] + prev[k][2],
                         cur[k][1] + cur[k][2]))
        return (0, 0) if lo is None else (lo, hi)

    def invalidate(self) -> None:
        self._cache.clear()

    # -- internals -------------------------------------------------------

    def _solo(self, para: str, vk: tuple):
        """Cached (solo layout, slots int32 [N], offsets f64 [N, 2])."""
        key = (para, vk)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        lay = layout_text(self.font, para, **self.options)
        n = len(lay.instances)
        slots = np.fromiter(
            (i.glyph_slot for i in lay.instances), np.int32, count=n)
        offs = np.array(
            [[i.x, i.y] for i in lay.instances], np.float64
        ).reshape(-1, 2)
        gids = np.asarray(lay.slot_gids, np.int64).reshape(-1)
        self._seq += 1
        entry = (lay, slots, offs, gids,
                 int(gids.max()) + 1 if len(gids) else 0, self._seq)
        self._cache[key] = entry
        if len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)
        return entry

    def _merge(self, solos: list, lh) -> TextLayout:
        flh = float(lh)
        # gid -> merged slot lookup table (vectorized dedup; gids are
        # non-negative — decoration slots, the only negative-id source,
        # are gated off the merge path)
        mg = max((e[4] for e in solos), default=0)
        table = np.full(mg, -1, np.int32)
        spans: list[tuple] = []
        slot_gids: list[int] = []
        slot_chars: list[int] = []
        # per merged slot: (padded seg row, count, box row, advance)
        rows: list[tuple[np.ndarray, int, np.ndarray, int]] = []
        slot_chunks: list[np.ndarray] = []
        off_chunks: list[np.ndarray] = []
        width = 0.0
        base = 0  # cumulative visual (post-wrap) line count
        for lay, pslots, poffs, gids, _mg, token in solos:
            remap = table[gids] if len(gids) else table[:0]
            new = np.nonzero(remap < 0)[0]
            if len(new):
                b = lay.batch
                start = len(slot_gids)
                assigned = np.arange(start, start + len(new), dtype=np.int32)
                table[gids[new]] = assigned
                remap[new] = assigned
                for j in new:
                    j = int(j)
                    slot_gids.append(lay.slot_gids[j])
                    slot_chars.append(lay.slot_chars[j])
                    rows.append((
                        b.segments[j], int(b.seg_counts[j]),
                        b.boxes[j], int(b.advance_widths[j]),
                    ))
            slot_chunks.append(remap[pslots] if len(pslots) else pslots)
            if base == 0:
                off_chunks.append(poffs)
            else:
                # base*flh is an exact integer-valued float (flh is
                # gated integral), so the columnwise shift reproduces
                # the full layout's -line_no*line_height pen bit-for-bit
                shifted = poffs.copy()
                shifted[:, 1] -= base * flh
                off_chunks.append(shifted)
            if lay.width > width:
                width = lay.width
            n_lines = int(round(float(lay.height) / flh))
            spans.append((token, base, n_lines))
            base += n_lines
        instances = LazyInstances(
            np.concatenate(slot_chunks),
            np.concatenate(off_chunks).reshape(-1, 2),
        )
        # union batch: capacity = max solo capacity == the full
        # layout's round_up(max seg count) (max of per-para round-ups)
        from fontrx.pack.segments import SEG_ALIGN

        cap = max((r[0].shape[0] for r in rows), default=SEG_ALIGN)
        nb = len(rows)
        segments = np.zeros((nb, cap, 3, 2), dtype=np.float32)
        seg_counts = np.zeros(nb, dtype=np.int32)
        boxes = np.zeros((nb, 4), dtype=np.int32)
        aw = np.zeros(nb, dtype=np.int32)
        for i, (seg, n, box, adv) in enumerate(rows):
            segments[i, : seg.shape[0]] = seg
            seg_counts[i] = n
            boxes[i] = box
            aw[i] = adv
        self._last_spans = spans
        return TextLayout(
            batch=PackedBatch(segments, seg_counts, boxes, aw),
            slot_chars=slot_chars,
            slot_gids=slot_gids,
            instances=instances,
            width=width,
            height=base * lh,
        )
