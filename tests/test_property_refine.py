"""Property-based invariants for the refinement + pubtables kernels
(hypothesis): for ANY deterministic proposal set the outputs must be a
disjoint rectangle tiling covering every input tile — the contract the
reference's fixpoint guarantees."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deepdoctection_spark.kernels.pubtables import segment_pubtables_grid
from deepdoctection_spark.kernels.refine import ProposedCell, refine_cells

cells_strategy = st.lists(
    st.tuples(
        st.integers(1, 4),  # row
        st.integers(1, 4),  # col
        st.integers(1, 3),  # row_span
        st.integers(1, 3),  # col_span
    ),
    min_size=1,
    max_size=8,
)


def _tiles(r, c, rs, cs):
    return {(r + i, c + j) for i in range(rs) for j in range(cs)}


@settings(max_examples=150, deadline=None, derandomize=True)
@given(cells_strategy)
def test_refine_produces_disjoint_rectangle_cover(raw):
    cells = [
        ProposedCell(f"c{i}", r, c, rs, cs, f"t{i}")
        for i, (r, c, rs, cs) in enumerate(raw)
    ]
    refined = refine_cells(cells)
    input_tiles = set().union(*(_tiles(*t) for t in raw))
    seen: set = set()
    for rc in refined:
        tiles = _tiles(rc.row_number, rc.column_number, rc.row_span, rc.column_span)
        # rectangles must be pairwise disjoint
        assert not (tiles & seen)
        seen |= tiles
    # every input tile is covered; extras only arise from gap absorption
    assert input_tiles <= seen
    # every input cell's id appears exactly once across components
    ids = [i for rc in refined for i in rc.member_ids]
    assert sorted(ids) == sorted(c.cell_id for c in cells)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(
    st.integers(1, 4),
    st.integers(1, 4),
    st.lists(
        st.tuples(st.floats(0, 80), st.floats(0, 80), st.floats(5, 40), st.floats(5, 40)),
        max_size=2,
    ),
)
def test_pubtables_grid_is_consistent(n_rows, n_cols, span_raw):
    rows = [(0.0, 20.0 * i, 30.0 * n_cols, 20.0 * (i + 1)) for i in range(n_rows)]
    cols = [(30.0 * j, 0.0, 30.0 * (j + 1), 20.0 * n_rows) for j in range(n_cols)]
    spanning = [(x, y, x + w, y + h) for x, y, w, h in span_raw]
    res = segment_pubtables_grid(rows, cols, spanning)
    # summary contract (segment.py:1017): n_rows/n_cols = MAX POSITION over
    # active cells — a full-height spanning cell at row 1 legitimately gives
    # n_rows 1; the spanned EXTENT still reaches the stripe grid
    assert res.n_rows == max((c.row_number for c in res.cells), default=0)
    extent_rows = max(
        (c.row_number + c.row_span - 1 for c in res.cells), default=0
    )
    assert extent_rows >= n_rows
    # cell positions positive; simple+spanning count bounded
    for c in res.cells:
        assert c.row_number >= 0 and c.column_number >= 0
        assert c.row_span >= 1 and c.column_span >= 1
    assert len(res.cells) <= n_rows * n_cols + len(spanning)
    # html always parses back to >= 1 row
    assert res.html.startswith("<table>") and res.html.endswith("</table>")
