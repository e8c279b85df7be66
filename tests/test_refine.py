"""Cell-merge refinement kernel: the reference's golden tiling cases
(/root/reference/tests/pipe/test_refine.py:42-103) re-expressed on
ProposedCell inputs, plus HTML-contract and fixpoint checks. The Spark
end-to-end check is the table_refined row of the parity gate."""

from __future__ import annotations

from deepdoctection_spark.kernels.refine import (
    ProposedCell,
    refine_cells,
    refined_cells_to_html,
)


def P(cid, r, c, rs=1, cs=1, text=""):
    return ProposedCell(cid, r, c, rs, cs, text or cid)


def groups(cells):
    return sorted(tuple(sorted(c.member_ids)) for c in refine_cells(cells))


def test_all_rectangular_no_merge():
    # reference case 1: every proposal already tiles a rectangle → singletons
    cells = [
        P("a", 1, 1), P("b", 1, 2, cs=2), P("c", 2, 1),
        P("d", 2, 2), P("e", 2, 3), P("f", 3, 1, cs=3),
    ]
    assert groups(cells) == [("a",), ("b",), ("c",), ("d",), ("e",), ("f",)]


def test_shared_tiles_merge_row():
    # reference case 2: f (colspan 3) overlaps c, d, e → one merged component
    cells = [
        P("a", 1, 1), P("b", 1, 2, cs=2), P("c", 2, 1),
        P("d", 2, 2), P("e", 2, 3), P("f", 2, 1, cs=3),
    ]
    assert groups(cells) == [("a",), ("b",), ("c", "d", "e", "f")]


def test_rectangle_fixpoint_merges_all():
    # reference case 3: overlapping chains force the whole table into one cell
    cells = [
        P("a", 1, 1), P("b", 1, 2), P("c", 1, 2, rs=2),
        P("d", 2, 1), P("e", 2, 2), P("f", 2, 1, cs=2),
    ]
    assert groups(cells) == [("a", "b", "c", "d", "e", "f")]


def test_unowned_gap_tile_absorbed():
    # a single cell claiming an L (via two overlapping proposals) around an
    # unclaimed tile: the gap is absorbed, not an error
    cells = [P("a", 1, 1, rs=2), P("b", 2, 1, cs=2)]
    refined = refine_cells(cells)
    assert len(refined) == 1
    r = refined[0]
    assert (r.row_number, r.column_number, r.row_span, r.column_span) == (1, 1, 2, 2)
    assert r.text == "a b"


def test_vertical_merge_html():
    cells = [
        P("c00", 1, 1, rs=2, text="A"), P("c01", 1, 2, text="B"),
        P("c10", 2, 1, text="C"), P("c11", 2, 2, text="D"),
    ]
    html = refined_cells_to_html(refine_cells(cells), 2)
    assert html == (
        "<table><tr><td rowspan=2>A C</td><td>B</td></tr>"
        "<tr><td>D</td></tr></table>"
    )


def test_full_merge_emits_empty_spanned_row():
    # generate_html_string contract: fully-spanned rows still emit <tr></tr>
    cells = [
        P("c00", 1, 1, rs=2, text="A"), P("c01", 1, 2, text="B"),
        P("c10", 2, 1, cs=2, text="C"), P("c11", 2, 2, text="D"),
    ]
    html = refined_cells_to_html(refine_cells(cells), 2)
    assert html == (
        "<table><tr><td rowspan=2 colspan=2>A B C D</td></tr>"
        "<tr></tr></table>"
    )


def test_merged_text_in_row_col_order():
    cells = [
        P("x", 2, 2, text="late"), P("y", 1, 1, cs=2, text="first"),
        P("z", 1, 2, rs=2, text="mid"), P("w", 2, 1, text="third"),
    ]
    refined = refine_cells(cells)
    assert len(refined) == 1
    assert refined[0].text == "first mid third late"


def test_csv_spanned_tiles_blank():
    from deepdoctection_spark.kernels.refine import cells_to_csv

    cells = refine_cells([
        P("c00", 1, 1, rs=2, text="A"), P("c01", 1, 2, text="B"),
        P("c10", 2, 1, text="C"), P("c11", 2, 2, text="D"),
    ])
    # merged (1,1) rowspan-2 cell "A C": text at the upper-left tile only
    assert cells_to_csv(cells, 2, 2) == ["A C \tB ", "\tD "]
