"""Cell-merge refinement: noisy segmenter cells → rectangular merged cells.

Re-expression of the reference's TableSegmentationRefinementService
(/root/reference/deepdoctection/pipe/refine.py:44-296):

1. Each proposed cell (row, col, row_span, col_span) claims the tiles of the
   (rows × cols) table grid it covers (tiles_to_cells, refine.py:44-72).
2. Cells sharing a tile are connected; connected components are computed with
   a plain union-find (the reference uses networkx connected_components,
   refine.py:103-113 — same result, no dependency).
3. Components are merged to a fixpoint so every component's tile set is a
   full rectangle (generate_rectangle_tiling + _merge_components,
   refine.py:140-181): a tile missing inside a component's bounding box is
   absorbed if unowned, or forces a merge with its owning component.
4. Each final component becomes ONE refined cell at (min row, min col) with
   spans = bounding-box extents (_tiling_to_cell_position, refine.py:203-208);
   member texts join with single spaces in (row, col) order (the text-domain
   analogue of merge_boxes, refine.py:418-420).
5. HTML mirrors generate_html_string (refine.py:297-346): rows 1..n_rows all
   emitted (a fully-spanned row renders as an empty <tr></tr>), span
   attributes unquoted and only when > 1, rowspan before colspan.

Everything is row-local (a table has ≤ 10³ cells) — pure Python inside the
Arrow batch stage, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

Tile = tuple[int, int]


@dataclass(slots=True)
class ProposedCell:
    cell_id: str
    row_number: int  # 1-based
    column_number: int
    row_span: int
    column_span: int
    text: str


@dataclass(slots=True)
class RefinedCell:
    row_number: int
    column_number: int
    row_span: int
    column_span: int
    text: str
    member_ids: list[str]


def _tiles_of(cell: ProposedCell) -> list[Tile]:
    return [
        (cell.row_number + k, cell.column_number + l)
        for k in range(cell.row_span)
        for l in range(cell.column_span)
    ]


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        root = self.parent.setdefault(x, x)
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> int:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra
        return ra


def _components(cells: list[ProposedCell]) -> list[tuple[set[int], set[Tile]]]:
    """Connected components of cells linked by shared tiles (refine.py:76-116)."""
    uf = _UnionFind()
    tile_claims: dict[Tile, int] = {}
    for i, c in enumerate(cells):
        uf.find(i)
        for t in _tiles_of(c):
            if t in tile_claims:
                uf.union(tile_claims[t], i)
            else:
                tile_claims[t] = i
    groups: dict[int, tuple[set[int], set[Tile]]] = {}
    for i, c in enumerate(cells):
        members, tiles = groups.setdefault(uf.find(i), (set(), set()))
        members.add(i)
        tiles.update(_tiles_of(c))
    return list(groups.values())


def _missing_tile(tiles: set[Tile]) -> Tile | None:
    """First tile absent inside the bounding box, row-major
    (refine.py:119-131)."""
    rmin = min(t[0] for t in tiles)
    cmin = min(t[1] for t in tiles)
    rmax = max(t[0] for t in tiles)
    cmax = max(t[1] for t in tiles)
    for r in range(rmin, rmax + 1):
        for c in range(cmin, cmax + 1):
            if (r, c) not in tiles:
                return (r, c)
    return None


def _rectangle_fixpoint(
    comps: list[tuple[set[int], set[Tile]]]
) -> list[tuple[set[int], set[Tile]]]:
    """Merge/absorb until every component's tiles form a full rectangle
    (generate_rectangle_tiling, refine.py:163-181). The fixpoint partition is
    order-independent: a missing tile either joins two components (transitive
    closure) or is absorbed as an unowned tile — both monotone."""
    comps = [(set(m), set(t)) for m, t in comps]
    changed = True
    while changed:
        changed = False
        for idx, (members, tiles) in enumerate(comps):
            gap = _missing_tile(tiles)
            if gap is None:
                continue
            owner = next(
                (j for j, (_, t2) in enumerate(comps) if j != idx and gap in t2),
                None,
            )
            if owner is None:
                tiles.add(gap)
            else:
                om, ot = comps[owner]
                members.update(om)
                tiles.update(ot)
                del comps[owner]
            changed = True
            break
    return comps


def refine_cells(cells: list[ProposedCell]) -> list[RefinedCell]:
    """Full refinement: components → rectangle fixpoint → merged cells, in
    (row, col) order."""
    out: list[RefinedCell] = []
    for members, tiles in _rectangle_fixpoint(_components(cells)):
        rmin = min(t[0] for t in tiles)
        cmin = min(t[1] for t in tiles)
        rs = max(t[0] for t in tiles) - rmin + 1
        cs = max(t[1] for t in tiles) - cmin + 1
        ordered = sorted(
            (cells[i] for i in members),
            key=lambda c: (c.row_number, c.column_number),
        )
        text = " ".join(c.text for c in ordered if c.text)
        out.append(
            RefinedCell(rmin, cmin, rs, cs, text, [c.cell_id for c in ordered])
        )
    out.sort(key=lambda c: (c.row_number, c.column_number))
    return out


def cells_to_csv(cells: list[RefinedCell], n_rows: int, n_cols: int) -> list[str]:
    """csv-style rows (Table.csv,
    /root/reference/deepdoctection/datapoint/view.py:332-344): an n_rows ×
    n_cols grid of strings; each cell's text lands on its upper-left tile
    with a trailing space appended; tiles covered by spans stay blank.
    Returned as one tab-joined string per row."""
    grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for c in cells:
        grid[c.row_number - 1][c.column_number - 1] += c.text + " "
    return ["\t".join(row) for row in grid]


def refined_cells_to_html(cells: list[RefinedCell], n_rows: int) -> str:
    """generate_html_string semantics (refine.py:297-346): every row 1..n_rows
    emits a <tr> (possibly empty when fully covered by spans from above);
    cells sorted by column; unquoted rowspan/colspan only when > 1."""
    parts = ["<table>"]
    for r in range(1, n_rows + 1):
        parts.append("<tr>")
        for c in sorted(
            (c for c in cells if c.row_number == r),
            key=lambda x: x.column_number,
        ):
            attrs = ""
            if c.row_span > 1:
                attrs += f" rowspan={c.row_span}"
            if c.column_span > 1:
                attrs += f" colspan={c.column_span}"
            parts.append(f"<td{attrs}>{c.text}</td>")
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)
