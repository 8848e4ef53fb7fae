"""Picture partitioning model (tiles / slices / subpictures, spec 6.5.1).

Structural parity with tile.rs / slice.rs / the Unit*Splitters: the
general tile-grid and slice-to-tile mappings are exercised on multi-tile
layouts (capability the reference carries but never instantiates); the
operating point remains 1 tile / 1 slice / 1 subpicture.
"""
import pytest

from wrenc_tpu.core.partition import (PictureLayout, TileGrid,
                                      raster_slices, rect_slices,
                                      single_layout)


def test_single_layout_is_raster():
    lay = single_layout(11, 9)
    assert lay.grid.num_tiles == 1
    assert len(lay.slices) == 1
    order = lay.ctu_order()
    assert order == [(x, y) for y in range(9) for x in range(11)]


def test_uniform_fill_tile_grid():
    # explicit first column of 2, uniform 2-wide fill over 7 columns
    g = TileGrid.make(7, 5, exp_col_widths=[2], exp_row_heights=[3])
    assert g.col_widths == [2, 2, 2, 1]
    assert g.row_heights == [3, 2]
    assert g.num_tiles == 8
    assert g.col_bd() == [0, 2, 4, 6, 7]
    assert g.row_bd() == [0, 3, 5]


def test_tile_of_ctu_and_tile_scan_cover_picture():
    g = TileGrid.make(6, 4, exp_col_widths=[3], exp_row_heights=[2])
    assert g.num_tiles == 4
    # membership agrees with ctus_of_tile
    for t in range(g.num_tiles):
        for (cx, cy) in g.ctus_of_tile(t):
            assert g.tile_of_ctu(cx, cy) == t
    scan = g.ctu_tile_scan()
    assert len(scan) == 24 and len(set(scan)) == 24
    # tile scan: all of tile 0 (top-left 3x2) precedes tile 1
    assert scan[:6] == [(x, y) for y in range(2) for x in range(3)]


def test_raster_slices():
    g = TileGrid.make(6, 4, exp_col_widths=[3], exp_row_heights=[2])
    slices = raster_slices(g, [1, 3])
    assert [s.tiles for s in slices] == [[0], [1, 2, 3]]
    lay = PictureLayout(g, slices)
    order = lay.ctu_order()
    assert len(order) == 24 and len(set(order)) == 24
    with pytest.raises(AssertionError):
        raster_slices(g, [1, 1])      # doesn't cover the picture


def test_rect_slices():
    g = TileGrid.make(6, 4, exp_col_widths=[2], exp_row_heights=[2])
    assert g.num_tile_cols == 3 and g.num_tile_rows == 2
    slices = rect_slices(g, [(0, 2, 2), (2, 1, 2)])
    assert [sorted(s.tiles) for s in slices] == [[0, 1, 3, 4], [2, 5]]
    with pytest.raises(AssertionError):
        rect_slices(g, [(0, 2, 2)])              # doesn't cover the picture
    with pytest.raises(AssertionError):
        rect_slices(g, [(0, 2, 2), (1, 2, 2)])   # overlap


def test_encoder_uses_layout_order():
    """The encoder's Python slice path walks CTUs via the layout; with the
    operating-point layout the stream is unchanged vs the native path."""
    import numpy as np
    from wrenc_tpu.core.config import EncoderConfig
    from wrenc_tpu.encoder import Encoder

    rng = np.random.default_rng(2)
    y = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    frame = (y, (y[::2, ::2] // 2 + 50).astype(np.uint8),
             (200 - y[::2, ::2] // 2).astype(np.uint8))
    cfg = EncoderConfig(width=96, height=64, qp=32)
    s_py, _ = Encoder(cfg, use_native=False).encode([frame])
    s_nat, _ = Encoder(cfg, use_native=True).encode([frame])
    assert s_py == s_nat
