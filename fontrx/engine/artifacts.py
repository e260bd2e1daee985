"""Rendered-artifact cache: atlases/SDF sheets persisted on disk.

SURVEY §5.4's optional extension beyond the compile cache: rendered
atlas artifacts keyed by (font content hash, charset, size, mode,
renderer version), so a service restart serves font atlases without
re-rasterizing.  The integrity discipline mirrors the reference's
``CacheManager`` (write only when the content identity changes,
``CacheManager.zig:163-188``), done here by content-addressed naming —
a key's file is immutable once written.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import numpy as np

from fontrx.utils.log import get_logger

log = get_logger("Artifacts")

DEFAULT_DIR = "~/.cache/fontrx/artifacts"
VERSION = 2  # bump when raster semantics change


class ArtifactCache:
    def __init__(self, directory: str | None = None):
        directory = directory or os.environ.get(
            "FONTRX_ARTIFACT_DIR", DEFAULT_DIR
        )
        self.dir = pathlib.Path(directory).expanduser()
        self.dir.mkdir(parents=True, exist_ok=True)

    @staticmethod
    def key(font_data: bytes, chars, size: int, mode: str, **params) -> str:
        h = hashlib.sha256()
        h.update(font_data)
        h.update(repr(sorted(chars)).encode())
        h.update(f"{size}|{mode}|{VERSION}|{sorted(params.items())}".encode())
        return h.hexdigest()[:32]

    def _path(self, key: str) -> pathlib.Path:
        return self.dir / f"{key}.npz"

    def get(self, key: str):
        p = self._path(key)
        if not p.exists():
            return None
        try:
            with np.load(p, allow_pickle=False) as z:
                return {k: z[k] for k in z.files}
        except Exception as e:  # corrupt file degrades to a miss
            log.warning("corrupt artifact %s (%s); ignoring", p.name, e)
            return None

    def put(self, key: str, **arrays) -> None:
        p = self._path(key)
        if p.exists():  # content-addressed: identical by construction
            return
        # (np.savez appends .npz to extension-less names — keep it)
        tmp = p.with_name(p.stem + ".tmp.npz")
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, p)  # atomic publish

    def stats(self) -> dict:
        files = list(self.dir.glob("*.npz"))
        return {
            "entries": len(files),
            "bytes": sum(f.stat().st_size for f in files),
            "dir": str(self.dir),
        }


def cached_atlas(
    font, chars, font_size: int, tile: int, engine=None,
    cache: ArtifactCache | None = None,
):
    """``render_atlas`` with artifact caching."""
    from fontrx.engine.atlas import AtlasLayout, render_atlas

    cache = cache or ArtifactCache()
    codes = [ord(c) for c in chars] if isinstance(chars, str) else list(chars)
    key = ArtifactCache.key(font._reader.data, codes, font_size, "fill",
                            tile=tile)
    hit = cache.get(key)
    if hit is not None:
        log.debug("atlas cache hit %s", key)
        layout = AtlasLayout(tile, int(hit["cols"]), int(hit["rows"]),
                             tuple(codes))
        return hit["sheet"], layout
    sheet, layout = render_atlas(font, codes, font_size, tile, engine)
    cache.put(key, sheet=sheet, cols=np.int64(layout.cols),
              rows=np.int64(layout.rows))
    return sheet, layout
