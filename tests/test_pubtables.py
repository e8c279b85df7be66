"""Pubtables segmentation kernel: weighted-IoA matching, center-sort
numbering, footprint deactivation, HTML contract (Spark end-to-end is the
pubtables_cells row of the parity gate)."""

from __future__ import annotations

from deepdoctection_spark.kernels.pubtables import segment_pubtables_grid
from deepdoctection_spark.operators.pubtablesop import stripe_geometry

ROWS2 = [(0.0, 0.0, 90.0, 20.0), (0.0, 20.0, 90.0, 40.0)]
COLS3 = [(0.0, 0.0, 30.0, 40.0), (30.0, 0.0, 60.0, 40.0), (60.0, 0.0, 90.0, 40.0)]


def test_clean_grid_all_simple_cells():
    res = segment_pubtables_grid(ROWS2, COLS3, [])
    assert (res.n_rows, res.n_cols, len(res.cells)) == (2, 3, 6)
    assert res.max_row_span == res.max_col_span == 1
    assert "r1c1" in res.html and "r2c3" in res.html


def test_input_order_irrelevant():
    # stripes fed reversed: center-sort must restore 1..N numbering
    a = segment_pubtables_grid(ROWS2, COLS3, [])
    b = segment_pubtables_grid(ROWS2[::-1], COLS3[::-1], [])
    assert a.html == b.html


def test_weighted_ioa_places_rowspan_cell():
    # cell covers rows 1-2 at raw IoA 0.5 each — only the ×2 intersection
    # weight lifts it above the 0.4 threshold (the pubtables rule)
    res = segment_pubtables_grid(ROWS2, COLS3, [(2.0, 3.0, 28.0, 37.0)])
    spanning = [c for c in res.cells if c.text == "s1"]
    assert len(spanning) == 1
    s = spanning[0]
    assert (s.row_number, s.column_number, s.row_span, s.column_span) == (1, 1, 2, 1)
    # covered simple cells deactivated
    texts = {c.text for c in res.cells}
    assert "r1c1" not in texts and "r2c1" not in texts
    assert len(res.cells) == 5
    assert res.max_row_span == 2


def test_unweighted_ioa_below_threshold_not_matched():
    # same box but threshold 1.5 cannot be exceeded → unmatched → the cell is
    # dropped and counted, never placed at the (0, *) sentinel (a row-0 cell
    # would be invisible to the 1..n_rows HTML walk yet counted in summaries)
    res = segment_pubtables_grid(
        ROWS2, COLS3, [(2.0, 3.0, 28.0, 37.0)], threshold_rows=1.5
    )
    assert not [c for c in res.cells if c.text == "s1"]
    assert res.n_unmatched == 1
    assert len(res.cells) == 6  # full simple grid intact
    assert res.max_row_span == res.max_col_span == 1


def test_unmatched_spanning_box_far_outside():
    res = segment_pubtables_grid(ROWS2, COLS3, [(200.0, 200.0, 210.0, 210.0)])
    assert res.n_unmatched == 1 and len(res.cells) == 6
    # CSV/HTML stay internally consistent (the old sentinel IndexError'd here)
    from deepdoctection_spark.kernels.refine import cells_to_csv

    assert len(cells_to_csv(res.cells, res.n_rows, res.n_cols)) == 2


def test_colspan_cell_html():
    res = segment_pubtables_grid(ROWS2, COLS3, [(33.0, 2.0, 87.0, 18.0)])
    assert "<td colspan=2>s1</td>" in res.html
    assert res.html.startswith("<table><tr><td>r1c1</td><td colspan=2>s1</td></tr>")


def test_stripe_geometry_variants():
    for t in range(6):
        rows, cols, span = stripe_geometry(t)
        assert len(rows) == 2 + t % 2
        assert len(cols) == 3
        assert len(span) == 1  # v0's box is the no-match quarantine probe
        res = segment_pubtables_grid(rows, cols, span)
        assert res.n_unmatched == (1 if t % 3 == 0 else 0)
