"""Multi-device raster sharding.

The reference is strictly single-GPU (SURVEY §2.8); this module is the
driver-mandated TPU-native scale-out: a ``jax.sharding.Mesh`` over a
``glyphs`` axis, with the batch dimension of every raster input sharded
across devices so each chip rasterizes its slice of the atlas and the
sheet is assembled by XLA's all-gather over ICI (the analog of
swapchain present, SURVEY §5.8).

Design notes (TPU-first):
- Glyph-batch sharding is embarrassingly parallel — no collectives in
  the hot loop; XLA inserts a single all-gather only if the caller asks
  for a replicated result.
- ``shard_map`` + the Pallas kernel composes: each device runs the same
  static-shape kernel on its ``B/n`` shard.
- Tested on a virtual 8-device CPU mesh
  (``--xla_force_host_platform_device_count``); the driver dry-runs the
  same path via ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fontrx.kernels.winding_jnp import winding_batch as _winding_jnp_batch
from fontrx.kernels.winding_pallas import winding_pallas_batch
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
from fontrx.utils.log import get_logger

log = get_logger("Sharding")

GLYPH_AXIS = "glyphs"
ROW_AXIS = "rows"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the glyph axis (atlas scale-out rides data
    parallelism; no tensor-style sharding is profitable for raster)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: n_devices]
    return Mesh(np.array(devices), (GLYPH_AXIS,))


def make_mesh_2d(
    n_glyph: int, n_rows: int, devices=None
) -> Mesh:
    """2-D mesh (glyphs x row-bands): data parallelism over the glyph
    batch crossed with spatial parallelism over pixel-row bands — the
    raster analog of DP x SP.  Row bands are independent (winding is
    per-row), so the only collective is the output layout itself."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_glyph * n_rows]).reshape(n_glyph, n_rows)
    return Mesh(devices, (GLYPH_AXIS, ROW_AXIS))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading (glyph) dim sharded over the
    mesh — the TPU analog of per-glyph staging-buffer uploads
    (``src/Appli.zig:243-275``), except the 'upload' lands pre-sharded."""
    sharding = NamedSharding(mesh, P(GLYPH_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "mesh", "use_pallas", "replicate_out", "interpret",
    ),
)
def winding_sharded(
    segments,
    min_x,
    max_y,
    scale,
    *,
    height: int,
    width: int,
    mesh: Mesh,
    use_pallas: bool = True,
    replicate_out: bool = False,
    interpret: bool = False,
):
    """Batched winding maps with the glyph axis sharded over ``mesh``.

    ``B`` must divide by the mesh size (pad with empty glyphs via
    ``pack_glyphs(pad_batch_to=...)``).  Returns ``[B, H, W]`` int32 —
    sharded over glyphs, or replicated when ``replicate_out`` (one
    all-gather over ICI).
    """
    if use_pallas:
        def local(seg, mx, my):
            return winding_pallas_batch(
                seg, mx, my, scale, height=height, width=width,
                interpret=interpret,
            )
    else:
        def local(seg, mx, my):
            return _winding_jnp_batch(
                seg, mx, my, scale, height=height, width=width
            )

    spec = P(GLYPH_AXIS)
    out_spec = P() if replicate_out else spec
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # the kernels build loop carries from shard-agnostic zeros;
        # varying-axis tracking would demand pvary noise inside them
        check_vma=False,
    )
    out = fn(segments, min_x, max_y)
    if replicate_out:
        out = jax.lax.with_sharding_constraint(out, NamedSharding(mesh, P()))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "mesh", "use_pallas", "interpret"),
)
def winding_sharded_2d(
    segments,
    min_x,
    max_y,
    scale,
    *,
    height: int,
    width: int,
    mesh: Mesh,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Winding maps sharded over a 2-D (glyphs x row-bands) mesh.

    Each device rasters its glyph shard restricted to its horizontal
    band of the pixel grid — pure SPMD: the band grid is derived from
    ``jax.lax.axis_index(ROW_AXIS)`` (each band's ``max_y`` anchor drops
    by ``band_h`` rows), and the output's row dimension is sharded over
    the same axis, so XLA lays the bands out without any cross-device
    traffic.  ``height`` must divide by the row-axis size; segments are
    replicated along rows (small) and sharded along glyphs.
    """
    n_rows = mesh.shape[ROW_AXIS]
    assert height % n_rows == 0, (height, n_rows)
    band_h = height // n_rows

    # Kernel routing by band height: the v2 carry-sweep kernel owns
    # 128-row strips; thinner bands (sub-128) go to the v1 tile kernel
    # (8-row tiles) rather than tripping v2's strip assertion.
    from fontrx.kernels.winding_pallas import TILE_H as _V1_TILE_H
    from fontrx.kernels.winding_pallas_v2 import STRIP_ROWS as _V2_STRIP

    if use_pallas:
        if band_h % _V2_STRIP == 0:
            def kernel(seg, mx, my):
                return winding_pallas_v2_batch(
                    seg, mx, my, scale, height=band_h, width=width,
                    interpret=interpret,
                )
        elif band_h % _V1_TILE_H == 0:
            def kernel(seg, mx, my):
                return winding_pallas_batch(
                    seg, mx, my, scale, height=band_h, width=width,
                    interpret=interpret,
                )
        else:
            raise ValueError(
                f"band height {band_h} (height {height} / {n_rows} row "
                f"shards) must be a multiple of {_V1_TILE_H} for the "
                "Pallas path; pad height or use use_pallas=False"
            )
    else:
        def kernel(seg, mx, my):
            return _winding_jnp_batch(
                seg, mx, my, scale, height=band_h, width=width
            )

    def local(seg, mx, my):
        band = jax.lax.axis_index(ROW_AXIS)
        my_band = my - band * band_h
        return kernel(seg, mx, my_band)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(GLYPH_AXIS), P(GLYPH_AXIS), P(GLYPH_AXIS)),
        out_specs=P(GLYPH_AXIS, ROW_AXIS),
        check_vma=False,
    )
    return fn(segments, min_x, max_y)


def sdf_sharded(
    segments,
    min_x,
    max_y,
    scale,
    *,
    height: int,
    width: int,
    mesh: Mesh,
    use_pallas: bool = True,
    interpret: bool = False,
    flat: bool = False,
):
    """SDF atlas with the glyph axis sharded over ``mesh`` — the same
    embarrassing data parallelism as :func:`winding_sharded` (each chip
    computes its batch slice; no collectives in the hot loop).  Returns
    float32 ``[B, H, W]`` signed distances, glyph-sharded."""
    if use_pallas:
        from fontrx.kernels.sdf_pallas import sdf_pallas_batch

        def local(seg, mx, my):
            return sdf_pallas_batch(
                seg, mx, my, scale, height=height, width=width,
                interpret=interpret, flat=flat,
            )
    else:
        from fontrx.kernels.sdf import sdf_batch

        def local(seg, mx, my):
            return sdf_batch(
                seg, mx, my, scale, height=height, width=width
            )

    spec = P(GLYPH_AXIS)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(segments, min_x, max_y)


def loopblinn_sharded(
    tris,
    classes,
    min_x,
    max_y,
    scale,
    *,
    height: int,
    width: int,
    mesh: Mesh,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Triangle-mesh fill with the glyph axis sharded over ``mesh``.
    Returns bool ``[B, H, W]`` coverage, glyph-sharded."""
    from fontrx.kernels.loopblinn import (
        loopblinn_batch,
        loopblinn_pallas_batch,
    )

    if use_pallas:
        def local(tri, cls, mx, my):
            return loopblinn_pallas_batch(
                tri, cls, mx, my, scale, height=height, width=width,
                interpret=interpret,
            )
    else:
        def local(tri, cls, mx, my):
            return loopblinn_batch(
                tri, cls, mx, my, scale, height=height, width=width
            )

    spec = P(GLYPH_AXIS)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(tris, classes, min_x, max_y)


def coverage_sharded(
    segments,
    min_x,
    max_y,
    scale,
    *,
    height: int,
    width: int,
    samples: int = 2,
    mesh: Mesh,
    fused: bool = True,
    use_pallas: bool = True,
    exact: bool = True,
    interpret: bool = False,
):
    """k x k supersampled coverage with the glyph axis sharded over
    ``mesh`` — completes the sharded kernel-family set (winding, SDF,
    Loop-Blinn, coverage).  Both single-device strategies compose with
    ``shard_map`` unchanged: ``fused=True`` runs the single-launch
    fused kernel per shard, ``fused=False`` the k^2-offset multipass of
    the v2 winding kernel; ``use_pallas=False`` is the jnp multipass
    reference (the bit-exactness anchor).  Returns float32
    ``[B, H, W]`` coverage, glyph-sharded."""
    if use_pallas and fused:
        from fontrx.kernels.coverage_pallas import coverage_pallas_batch

        def local(seg, mx, my):
            return coverage_pallas_batch(
                seg, mx, my, scale, height=height, width=width,
                samples=samples, exact=exact, interpret=interpret,
            )
    elif use_pallas:
        from fontrx.kernels.coverage import coverage_batch_v2

        def local(seg, mx, my):
            return coverage_batch_v2(
                seg, mx, my, scale, height=height, width=width,
                samples=samples, exact=exact, interpret=interpret,
            )
    else:
        from fontrx.kernels.coverage import coverage_batch

        def local(seg, mx, my):
            return coverage_batch(
                seg, mx, my, scale, height=height, width=width,
                samples=samples,
            )

    spec = P(GLYPH_AXIS)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(segments, min_x, max_y)


def dense_sharded(
    segments,
    min_x,
    max_y,
    scale,
    *,
    height: int,
    width: int,
    mesh: Mesh,
    use_pallas: bool = True,
    exact: bool = True,
    interpret: bool = False,
):
    """The column-major dense-regime kernel
    (``kernels/winding_dense.py``), glyph-sharded — the CJK-atlas
    scale-out path.  Returns int32 ``[B, 128, width]`` like the
    single-device kernel (callers slice to ``height``)."""
    if use_pallas:
        from fontrx.kernels.winding_dense import winding_dense_batch

        def local(seg, mx, my):
            return winding_dense_batch(
                seg, mx, my, scale, height=height, width=width,
                exact=exact, interpret=interpret,
            )
    else:
        def local(seg, mx, my):
            return _winding_jnp_batch(
                seg, mx, my, scale, height=128, width=width
            )

    spec = P(GLYPH_AXIS)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(segments, min_x, max_y)


def make_row_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over page pixel-row bands (spatial parallelism for one
    large page — the multi-chip interactive/page path)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: n_devices]
    return Mesh(np.array(devices), (ROW_AXIS,))


def page_rows_sharded(
    flat_segments,
    page_h: int,
    page_w: int,
    *,
    mesh: Mesh,
    exact: bool = True,
    interpret: bool = False,
    use_pallas: bool = True,
    tuning=(0, 16, 128),
):
    """Direct-page raster with pixel-row BANDS sharded over ``mesh``:
    every device holds the full (replicated) page-space segment set and
    rasters its contiguous band of rows — winding is per-row, so bands
    are independent and the result is bit-identical to the
    single-device banded page (each row's ``cy`` equals
    ``page_h - 1 - row`` regardless of the band split; see
    ``scene/page.py::_direct_page_step``).

    ``flat_segments``: float32 ``[1, S, 3, 2]`` page-pixel-space
    segments.  Returns uint8-fill-convertible int32
    ``[page_h_padded, page_w_padded]`` winding, row-sharded; callers
    crop to ``page_h`` x ``page_w``."""
    n = mesh.devices.size
    ph = _round_up_mult(page_h, 128 * n)
    pw = _round_up_mult(page_w, 128)
    rows_per = ph // n

    if use_pallas:
        # the production wide-page kernel (deferred carries + dynamic
        # x-hull tile windows) when the band is wide enough, else v2 —
        # mirrors scene/page.py's dispatch
        def local(seg):
            k = jax.lax.axis_index(ROW_AXIS)
            my = jnp.full(1, page_h - 1 - k * rows_per, jnp.int32)
            if pw >= 1024:
                from fontrx.kernels.winding_page import (
                    winding_page_batch,
                )

                return winding_page_batch(
                    seg, jnp.zeros(1, jnp.int32), my, jnp.float32(1.0),
                    height=rows_per, width=pw, exact=exact,
                    interpret=interpret, seg_chunk=32,
                    tile_w=256 if pw % 256 == 0 else 128,
                    dynamic_tiles=True,
                )[0]
            return winding_pallas_v2_batch(
                seg, jnp.zeros(1, jnp.int32), my, jnp.float32(1.0),
                height=rows_per, width=pw, exact=exact,
                interpret=interpret, group_guard=tuning[0],
                seg_chunk=tuning[1],
                tile_w=tuning[2] or (256 if pw % 256 == 0 else 128),
            )[0]
    else:
        def local(seg):
            k = jax.lax.axis_index(ROW_AXIS)
            my = jnp.full(1, page_h - 1 - k * rows_per, jnp.int32)
            return _winding_jnp_batch(
                seg, jnp.zeros(1, jnp.int32), my, jnp.float32(1.0),
                height=rows_per, width=pw,
            )[0]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=P(ROW_AXIS, None),
        check_vma=False,
    )
    return fn(flat_segments)


def _round_up_mult(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
