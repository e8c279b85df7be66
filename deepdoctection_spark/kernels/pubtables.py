"""Pubtables-style table segmentation: intersection cells + spanning placement.

Re-expression of the reference's PubtablesSegmentationService
(/root/reference/deepdoctection/pipe/segment.py:839-1107) on 2-D stripe
geometry:

1. Row stripes are numbered 1.. by center-y sort, column stripes by center-x
   (segment.py:944-955) — input order is irrelevant.
2. Simple cells are synthesized as the row×column intersection rectangles,
   each (row, col, 1, 1) (create_intersection_cells, segment.py:489-537).
3. Detector-proposed spanning cells are matched to rows/columns with the
   WEIGHTED IoA rule (segment_pubtables, segment.py:597-640 via
   match_anns_by_intersection, mapper/match.py:133-162): ioa[cell, item] =
   intersection_area / cell_area, multiplied by the cell's count of nonzero
   item intersections, matched when strictly > threshold. Placement is
   (min matched number, extent = max - min + 1) per axis.
4. Simple cells whose grid position falls inside a spanning cell's footprint
   are deactivated (double allocation removal, segment.py:996-1010).
5. Summary = number_of_rows/cols + max spans over ACTIVE cells
   (segment.py:1012-1026); HTML follows generate_html_string
   (pipe/refine.py:297-346 — reused via kernels/refine.refined_cells_to_html).

Row-local (≤ 10³ stripes/cells per table): vectorized numpy inside the Arrow
stage, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from deepdoctection_spark.kernels.refine import RefinedCell

Box = tuple[float, float, float, float]  # (x0, y0, x1, y1)


@dataclass(slots=True)
class PubtablesResult:
    cells: list[RefinedCell]  # active cells (simple survivors + spanning)
    n_rows: int
    n_cols: int
    max_row_span: int
    max_col_span: int
    html: str
    n_unmatched: int = 0  # spanning boxes matching no stripe (dropped, flagged)


def _box_ioa(items: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """[cell, item] intersection-over-CELL-area (np_box_ops.ioa transposed,
    /root/reference/deepdoctection/mapper/match.py:138)."""
    if len(items) == 0 or len(cells) == 0:
        return np.zeros((len(cells), len(items)))
    ix0 = np.maximum(cells[:, None, 0], items[None, :, 0])
    iy0 = np.maximum(cells[:, None, 1], items[None, :, 1])
    ix1 = np.minimum(cells[:, None, 2], items[None, :, 2])
    iy1 = np.minimum(cells[:, None, 3], items[None, :, 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    area = np.clip(
        (cells[:, 2] - cells[:, 0]) * (cells[:, 3] - cells[:, 1]), 1e-9, None
    )
    return inter / area[:, None]


def _matched_extent(
    items: np.ndarray, cells: np.ndarray, threshold: float
) -> list[tuple[int, int]]:
    """Per cell: (min matched 1-based item number, extent) under the weighted
    IoA rule; (0, 1) when nothing matches (the reference's whole-table
    fallback quarantines instead — our per-row error column handles it)."""
    ioa = _box_ioa(items, cells)
    weights = (ioa != 0).sum(axis=1, keepdims=True)
    matched = (ioa * weights) > threshold
    out = []
    for c in range(len(cells)):
        nums = np.nonzero(matched[c])[0] + 1
        if len(nums) == 0:
            out.append((0, 1))
        else:
            out.append((int(nums.min()), int(nums.max() - nums.min() + 1)))
    return out


def segment_pubtables_grid(
    row_stripes: list[Box],
    col_stripes: list[Box],
    spanning: list[Box],
    threshold_rows: float = 0.4,
    threshold_cols: float = 0.4,
) -> PubtablesResult:
    """Full pubtables segmentation over stripe geometry. Cell texts are
    positional labels (simple: 'r{row}c{col}', spanning: 's{k}' in input
    order) — the reference's HTML embeds annotation ids the same way."""
    rows = sorted(row_stripes, key=lambda b: (b[1] + b[3]) / 2)  # center-y
    cols = sorted(col_stripes, key=lambda b: (b[0] + b[2]) / 2)  # center-x
    simple: dict[tuple[int, int], RefinedCell] = {}
    for r in range(1, len(rows) + 1):
        for c in range(1, len(cols) + 1):
            simple[(r, c)] = RefinedCell(r, c, 1, 1, f"r{r}c{c}", [])

    placed: list[RefinedCell] = []
    n_unmatched = 0
    if spanning:
        sp = np.array(spanning, dtype=np.float64)
        row_ext = _matched_extent(
            np.array(rows, dtype=np.float64), sp, threshold_rows
        )
        col_ext = _matched_extent(
            np.array(cols, dtype=np.float64), sp, threshold_cols
        )
        for k, ((rn, rs), (cn, cs)) in enumerate(zip(row_ext, col_ext), start=1):
            if rn == 0 or cn == 0:
                # Spanning box matched no stripe on some axis: a row-0 cell
                # would be counted in n_cells/max-spans but silently omitted
                # from the 1..n_rows HTML walk (and IndexError in the CSV
                # grid). The reference quarantines the whole table
                # (segment.py fallback); we drop the cell and surface the
                # count so callers can flag the table.
                n_unmatched += 1
                continue
            placed.append(RefinedCell(rn, cn, rs, cs, f"s{k}", []))
            for dr in range(rs):
                for dc in range(cs):
                    simple.pop((rn + dr, cn + dc), None)

    cells = sorted(
        list(simple.values()) + placed,
        key=lambda c: (c.row_number, c.column_number),
    )
    n_rows = max((c.row_number for c in cells), default=0)
    n_cols = max((c.column_number for c in cells), default=0)
    from deepdoctection_spark.kernels.refine import refined_cells_to_html

    return PubtablesResult(
        cells=cells,
        n_rows=n_rows,
        n_cols=n_cols,
        max_row_span=max((c.row_span for c in cells), default=0),
        max_col_span=max((c.column_span for c in cells), default=0),
        html=refined_cells_to_html(cells, n_rows),
        n_unmatched=n_unmatched,
    )
