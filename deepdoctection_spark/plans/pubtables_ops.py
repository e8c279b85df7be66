"""Pubtables intersection-cell query with a hand-derived DuckDB oracle.

Spark runs the real segmentation kernel (center-sort numbering, weighted-IoA
spanning placement, footprint deactivation, HTML assembly) over per-turn
stripe geometry; the oracle enumerates the six expected (n_rows × variant)
outcomes as literal rows keyed by turn_idx % 6 — derived by hand from the
geometry spec (operators/pubtablesop.stripe_geometry), never by running the
kernel.
"""

from __future__ import annotations

from deepdoctection_spark.operators.pubtablesop import pubtables_grids
from deepdoctection_spark.plans.registry import register
from deepdoctection_spark.sources.transcripts import (
    TRANSCRIPT_BASE_SQL,
    build_transcripts,
)


def _expected_case(n_rows: int, variant: int) -> tuple[int, int, int, str]:
    """(n_cells, max_row_span, max_col_span, html) — analytic expectation:
    3 columns; v1 places a rowspan-2 cell at (1,1), v2 a colspan-2 cell at
    (1,2); covered simple cells drop out."""
    rows: dict[int, list[str]] = {
        r: [f"<td>r{r}c{c}</td>" for c in (1, 2, 3)]
        for r in range(1, n_rows + 1)
    }
    n_cells = 3 * n_rows
    mrs = mcs = 1
    if variant == 1:
        rows[1] = ["<td rowspan=2>s1</td>", "<td>r1c2</td>", "<td>r1c3</td>"]
        rows[2] = ["<td>r2c2</td>", "<td>r2c3</td>"]
        n_cells, mrs = n_cells - 1, 2
    elif variant == 2:
        rows[1] = ["<td>r1c1</td>", "<td colspan=2>s1</td>"]
        n_cells, mcs = n_cells - 1, 2
    html = (
        "<table>"
        + "".join("<tr>" + "".join(rows[r]) + "</tr>" for r in sorted(rows))
        + "</table>"
    )
    return n_cells, mrs, mcs, html


def oracle_pubtables() -> str:
    cases = []
    for t6 in range(6):
        n_rows, variant = 2 + t6 % 2, t6 % 3
        n_cells, mrs, mcs, html = _expected_case(n_rows, variant)
        esc = html.replace("'", "''")
        cases.append(
            f"WHEN {t6} THEN struct_pack(n_rows := {n_rows}, n_cells := {n_cells}, "
            f"mrs := {mrs}, mcs := {mcs}, html := '{esc}')"
        )
    case = "CASE turn_idx % 6 " + " ".join(cases) + " END"
    return f"""
WITH base AS ({TRANSCRIPT_BASE_SQL}),
e AS (SELECT conv_id, turn_idx, {case} AS x FROM base)
SELECT conv_id, turn_idx,
       (x.n_rows)::INT AS n_rows, 3::INT AS n_cols, (x.n_cells)::INT AS n_cells,
       (x.mrs)::INT AS max_row_span, (x.mcs)::INT AS max_col_span,
       x.html AS table_html,
       (CASE WHEN turn_idx % 3 = 0 THEN 1 ELSE 0 END)::INT AS n_unmatched
FROM e
"""


@register("pubtables_cells", oracle_pubtables())
def q_pubtables_cells(spark, sf_dir):
    return pubtables_grids(build_transcripts(spark, sf_dir))
