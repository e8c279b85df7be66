"""PDF-like layout parse: positioned lines → columns → reading order.

The transcript analogue of the reference's reading-order engine
(/root/reference/deepdoctection/pipe/order.py):
- group positioned text lines into columns by x-coordinate clustering
  (reference: column building + consolidation, order.py:173-309),
- order columns left→right, lines within a column top→down
  (reference: final (column, y, x) sort, order.py:280-290),
- classify the unique topmost line as the title block (reference: layout
  category assignment via ImageLayoutService, pipe/layout.py:37-121).

Payload wire format (synthetic "pdf_reader" turns): one line per positioned
text run, ``@x,y:content``. This stands in for a PDF text-run stream — the
geometry kernels are the real thing; only the byte decode is synthetic (the
container has no pdfium/poppler; see sources/multimodal.py for the stub
boundary).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from operator import itemgetter
from typing import ClassVar

from deepdoctection_spark.kernels.textnorm import normalize_ws

_LINE_RE = re.compile(r"^@(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?):(.*)$")


@dataclass(slots=True)
class PositionedLine:
    x: float
    y: float
    content: str


@dataclass
class LayoutBlock:
    category: str  # title | text
    text: str
    lines: list[PositionedLine] = field(default_factory=list)

    # duck-compat with kernels.extract.Block: layout blocks never carry table
    # cells; a shared immutable empty tuple (ClassVar — not a dataclass
    # field) serves every instance with zero alloc
    cells: ClassVar[tuple] = ()


def parse_positioned_lines(payload: str) -> list[PositionedLine]:
    out = []
    for raw in payload.split("\n"):
        m = _LINE_RE.match(raw)
        if m:
            out.append(
                PositionedLine(float(m.group(1)), float(m.group(2)), m.group(3))
            )
    return out


def looks_like_layout(payload: str) -> bool:
    return payload.startswith("@") and _LINE_RE.match(payload.split("\n", 1)[0]) is not None


def make_sub_lines(
    runs: list[PositionedLine],
    paragraph_break: float,
    char_width: float = 0.0,
) -> list[PositionedLine]:
    """Split each LINE (same-y runs, x-sorted) into sub-lines at horizontal
    gaps ≥ paragraph_break — the reference's TextLineGenerator sub-line pass
    (/root/reference/deepdoctection/pipe/order.py:345-563: consecutive words
    stay in one sub-line while current.ulx - prev.lrx < paragraph_break).
    Runs within a sub-line merge into one positioned line (x = first run's x,
    texts space-joined) so multi-column structure is detected per LINE, not
    per whole-payload x histogram.

    ``char_width`` models a run's rendered width (prev.lrx = prev.x +
    char_width·len(prev)); the text wire format carries only start positions,
    so the default 0.0 measures start-to-start distance — the strongest
    signal available without font metrics. Detector-driven inputs with real
    box widths pass their measured width instead."""
    by_y: dict[float, list[PositionedLine]] = {}
    for r in runs:
        by_y.setdefault(r.y, []).append(r)
    out: list[PositionedLine] = []
    for y in sorted(by_y):
        row = sorted(by_y[y], key=lambda r: r.x)
        cur: list[PositionedLine] = [row[0]]
        for prev, nxt in zip(row, row[1:]):
            # char_width == 0.0 (the text wire format's start-to-start mode)
            # makes the normalize_ws(len) term vanish — skip the normalize
            prev_end = (
                prev.x + char_width * len(normalize_ws(prev.content))
                if char_width
                else prev.x
            )
            if nxt.x - prev_end < paragraph_break:
                cur.append(nxt)
            else:
                out.append(_merge_sub_line(cur))
                cur = [nxt]
        out.append(_merge_sub_line(cur))
    return out


def _merge_sub_line(runs: list[PositionedLine]) -> PositionedLine:
    texts = [t for t in (normalize_ws(r.content) for r in runs) if t]
    return PositionedLine(runs[0].x, runs[0].y, " ".join(texts))


def cluster_columns(lines: list[PositionedLine], column_gap: float) -> list[list[PositionedLine]]:
    """Bucket lines into columns: sorted distinct x starts a new column when
    the gap from the previous x exceeds ``column_gap`` (order.py:173-290
    column-building semantics on 1-D x instead of box intervals)."""
    if not lines:
        return []
    xs = sorted({ln.x for ln in lines})
    col_of_x: dict[float, int] = {}
    col = 0
    prev = xs[0]
    for x in xs:
        if x - prev > column_gap:
            col += 1
        col_of_x[x] = col
        prev = x
    ncols = col + 1
    buckets: list[list[PositionedLine]] = [[] for _ in range(ncols)]
    for ln in lines:
        buckets[col_of_x[ln.x]].append(ln)
    for b in buckets:
        b.sort(key=lambda ln: (ln.y, ln.x))
    return buckets


_LINE_SCAN = re.compile(_LINE_RE.pattern, re.M)
_YX = itemgetter(0, 1)


def extract_layout_blocks(
    payload: str,
    column_gap: float = 100.0,
    paragraph_break: float | None = None,
) -> list[LayoutBlock]:
    """title block (unique topmost line) + one text block per column, in
    reading order (title, then columns left→right, sub-lines top→down).
    paragraph_break defaults to column_gap (a within-line gap wide enough to
    start a column also starts a sub-line).

    Fused hot path (the PDF-ish third of every extraction batch): one
    multiline finditer parses all positioned runs as (y, x, content) tuples,
    one stable (y, x) sort replaces the per-row dict/sort of
    make_sub_lines, and the gap-split + merge walk allocates PositionedLine
    objects only for EMITTED sub-lines (a handful per document) instead of
    every run. Output is line-for-line identical to the
    parse_positioned_lines → make_sub_lines → cluster_columns composition
    (tests/test_kernels.py pins both paths)."""
    runs = [
        (float(m.group(2)), float(m.group(1)), m.group(3))
        for m in _LINE_SCAN.finditer(payload)
    ]
    if not runs:
        return []
    blocks: list[LayoutBlock] = []
    min_y = min(r[0] for r in runs)
    brk = column_gap if paragraph_break is None else paragraph_break
    tops = [r for r in runs if r[0] == min_y]
    if len(tops) == 1:
        ty, tx, tc = tops[0]
        tnorm = normalize_ws(tc)
        if tnorm:
            blocks.append(
                LayoutBlock("title", tnorm, lines=[PositionedLine(tx, ty, tc)])
            )
            # unique min-y run: any equal tuple would also be a top, so
            # remove-by-equality is remove-by-identity here
            runs.remove(tops[0])
    srt = sorted(runs, key=_YX)  # same row order as by-y grouping + x sort
    sub: list[PositionedLine] = []
    i, n_ = 0, len(srt)
    while i < n_:
        first = srt[i]
        y = first[0]
        texts = []
        t = normalize_ws(first[2])
        if t:
            texts.append(t)
        prev_x = first[1]
        i += 1
        while i < n_ and srt[i][0] == y:
            r = srt[i]
            if r[1] - prev_x >= brk:  # start-to-start gap: new sub-line
                sub.append(PositionedLine(first[1], y, " ".join(texts)))
                first = r
                texts = []
            t = normalize_ws(r[2])
            if t:
                texts.append(t)
            prev_x = r[1]
            i += 1
        sub.append(PositionedLine(first[1], y, " ".join(texts)))
    for bucket in cluster_columns(sub, column_gap):
        text = "\n".join(ln.content for ln in bucket if ln.content)
        if text:
            blocks.append(LayoutBlock("text", text, lines=bucket))
    return blocks
