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
    """Place td/th cells on an occupancy grid honoring rowspan/colspan."""
    from deepdoctection_spark.kernels.html import _gather_text  # local: circular

    occupied: set[tuple[int, int]] = set()
    cells: list[TableCell] = []
    for r, tr in enumerate(_find_rows(table_node), start=1):
        col = 1
        for td in tr.children:
            if td.tag not in ("td", "th"):
                continue
            while (r, col) in occupied:
                col += 1
            rs = _int_attr(td.attrs, "rowspan")
            cs = _int_attr(td.attrs, "colspan")
            for rr in range(r, r + rs):
                for cc in range(col, col + cs):
                    occupied.add((rr, cc))
            cells.append(
                TableCell(
                    text=_gather_text(td)[0],  # already normalized
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
    semantics; golden string format per tests/analyzer/test_dd.py:100-107)."""
    rows: dict[int, list[TableCell]] = {}
    for c in cells:
        rows.setdefault(c.row_number, []).append(c)
    parts = ["<table>"]
    for r in sorted(rows):
        parts.append("<tr>")
        for c in sorted(rows[r], key=lambda x: x.column_number):
            attrs = ""
            if c.row_span > 1:
                attrs += f" rowspan={c.row_span}"
            if c.column_span > 1:
                attrs += f" colspan={c.column_span}"
            parts.append(f"<td{attrs}>{c.text}</td>")
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)
