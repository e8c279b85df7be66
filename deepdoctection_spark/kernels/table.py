"""Table segmentation: grid placement with row/col spans + HTML synthesis.

Reference semantics re-expressed on DOM tables:
- cell → (row_number, column_number, row_span, column_span), 1-based, via
  occupancy-grid placement — the reference derives the same quadruple from
  box-center sorting + interval matching
  (/root/reference/deepdoctection/pipe/segment.py:399-486, 641-799).
- HTML synthesis mirrors generate_html_string
  (/root/reference/deepdoctection/pipe/refine.py:297-346): golden tests pin
  strings shaped like ``<table><tr><td rowspan=2>...`` (see
  /root/reference/tests/analyzer/test_dd.py:100-107) — span attributes are
  unquoted and emitted only when > 1, rowspan before colspan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

from deepdoctection_spark.kernels.textnorm import normalize_ws


if TYPE_CHECKING:  # avoid circular import at runtime
    from deepdoctection_spark.kernels.html import Node


@dataclass
class TableCell:
    text: str
    row_number: int  # 1-based
    column_number: int  # 1-based
    row_span: int = 1
    column_span: int = 1


# Span cap — browsers clamp similarly (HTML spec caps rowspan at 65534;
# we cap far lower). Without it, <td rowspan=2000000000> makes the occupancy
# fill O(rs*cs): a single poison row would hang/OOM an executor, the one
# failure mode the per-row quarantine cannot catch (same rationale as
# html.MAX_DEPTH). 256 bounds per-cell work at 64k grid inserts.
MAX_SPAN = 256


def _int_attr(attrs: dict, name: str, default: int = 1) -> int:
    v = attrs.get(name)
    if v is None:  # the common case: span-less cell — skip str/int churn
        return default
    try:
        v = int(str(v).strip() or default)
        return min(max(v, 1), MAX_SPAN)
    except (TypeError, ValueError):
        return default


def _find_rows(table_node: "Node") -> list["Node"]:
    rows: list[Node] = []

    def rec(nd) -> None:
        for c in nd.children:
            if c.tag == "tr":
                rows.append(c)
            elif c.tag in ("thead", "tbody", "tfoot"):
                rec(c)

    rec(table_node)
    return rows


def segment_table_grid(table_node: "Node") -> list[TableCell]:
    """Place td/th cells on an occupancy grid honoring rowspan/colspan.

    Occupancy bookkeeping is LAZY: within a row the column cursor only moves
    right, so a cell's own-row coverage (any colspan) can never be probed by
    a later cell in that row — only ``rowspan > 1`` coverage of LATER rows
    is ever queried. Span-free tables (the overwhelmingly common case) touch
    no set at all; single-text-child cells skip the subtree walk. Output is
    identical to the always-register version (tests/test_table.py +
    the `table_cells` oracle pin it)."""
    from deepdoctection_spark.kernels.html import _gather_text  # local: circular

    occupied: set[tuple[int, int]] | None = None
    normalize = normalize_ws
    cells: list[TableCell] = []
    for r, tr in enumerate(_find_rows(table_node), start=1):
        col = 1
        for td in tr.children:
            if td.tag not in ("td", "th"):
                continue
            if occupied:
                while (r, col) in occupied:
                    col += 1
            rs = _int_attr(td.attrs, "rowspan")
            cs = _int_attr(td.attrs, "colspan")
            if rs > 1:
                if occupied is None:
                    occupied = set()
                for rr in range(r + 1, r + rs):
                    for cc in range(col, col + cs):
                        occupied.add((rr, cc))
            ch = td.children
            if len(ch) == 1 and not ch[0].tag:
                text = normalize(ch[0].text)  # single text child: no walk
            else:
                text = _gather_text(td)[0]  # already normalized
            cells.append(
                TableCell(
                    text=text,
                    row_number=r,
                    column_number=col,
                    row_span=rs,
                    column_span=cs,
                )
            )
            col += cs
    return cells


def cells_to_html(cells: list[TableCell]) -> str:
    """Deterministic HTML string from segmented cells (refine.py:297-346
    semantics; golden string format per tests/analyzer/test_dd.py:100-107).

    Precondition: cells arrive row-major / column-ascending —
    :func:`segment_table_grid` (the only producer) emits that order, so one
    consecutive-grouping walk replaces the dict build + two sorts."""
    parts = ["<table>"]
    cur_row = None
    for c in cells:
        if c.row_number != cur_row:
            if cur_row is not None:
                parts.append("</tr>")
            parts.append("<tr>")
            cur_row = c.row_number
        rs, cs = c.row_span, c.column_span
        if rs > 1 or cs > 1:
            attrs = (f" rowspan={rs}" if rs > 1 else "") + (
                f" colspan={cs}" if cs > 1 else ""
            )
            parts.append(f"<td{attrs}>{c.text}</td>")
        else:
            parts.append(f"<td>{c.text}</td>")
    if cur_row is not None:
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)
