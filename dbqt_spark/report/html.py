"""Tabbed interactive HTML report (the reference's flagship sink).

Reproduces the behavior of ``HTMLReport`` (dbqt/tools/utils.py:462-659):
a self-contained HTML file with one Tabulator table per tab, numeric vs
string sorters AND per-column interactive header filters
("number"/"input" per dtype, plaintext formatter — utils.py:481-523)
inferred from column dtypes, NaN→null sanitization, and multi-sheet
XLSX export. Presentation layer only: it renders small *collected*
results (never distributed data).
"""

from __future__ import annotations

import json
import math
from typing import Any

from pyspark.sql import DataFrame

_NUMERIC_SPARK_TYPES = {
    "tinyint", "smallint", "int", "integer", "bigint", "long",
    "float", "double", "decimal",
}

_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>{title}</title>
<link href="https://unpkg.com/tabulator-tables@5.5.2/dist/css/tabulator.min.css" rel="stylesheet">
<script src="https://unpkg.com/tabulator-tables@5.5.2/dist/js/tabulator.min.js"></script>
<script src="https://cdn.sheetjs.com/xlsx-0.19.3/package/dist/xlsx.full.min.js"></script>
<style>
body {{ font-family: sans-serif; margin: 1rem; }}
.tabs {{ margin-bottom: 1rem; }}
.tabs button {{ padding: 0.5rem 1rem; cursor: pointer; }}
.tabs button.active {{ font-weight: bold; border-bottom: 2px solid #333; }}
.tab-content {{ display: none; }}
.tab-content.active {{ display: block; }}
</style>
</head>
<body>
<h1>{title}</h1>
<div class="tabs">{tab_buttons}
<button onclick="exportXlsx()">Export XLSX</button>
</div>
{tab_divs}
<script>
const TABS = {tabs_json};
const tables = {{}};
TABS.forEach((tab, i) => {{
  tables[tab.id] = new Tabulator("#" + tab.id, {{
    data: tab.rows,
    columns: tab.columns.map(c => ({{
      title: c.name, field: c.name,
      sorter: c.numeric ? "number" : "string",
      headerFilter: c.numeric ? "number" : "input",
      formatter: "plaintext",
    }})),
    layout: "fitDataFill",
    pagination: true,
    paginationSize: 50,
  }});
}});
function showTab(id) {{
  document.querySelectorAll(".tab-content").forEach(d => d.classList.remove("active"));
  document.querySelectorAll(".tabs button[data-tab]").forEach(b => b.classList.remove("active"));
  document.getElementById(id).classList.add("active");
  document.querySelector(`button[data-tab="${{id}}"]`).classList.add("active");
}}
function exportXlsx() {{
  const wb = XLSX.utils.book_new();
  TABS.forEach(tab => {{
    const ws = XLSX.utils.json_to_sheet(tab.rows);
    XLSX.utils.book_append_sheet(wb, ws, tab.name.substring(0, 31));
  }});
  XLSX.writeFile(wb, "{title}.xlsx");
}}
if (TABS.length) showTab(TABS[0].id);
</script>
</body>
</html>
"""


def _sanitize(v: Any) -> Any:
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None  # NaN→null (reference utils.py:539-544)
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


class HTMLReport:
    """Accumulate tabs of (name, columns, rows); ``save`` renders one
    self-contained HTML file."""

    def __init__(self, title: str = "dbqt_spark report"):
        self.title = title
        self.tabs: list[dict] = []

    def add_tab(
        self,
        name: str,
        columns: list[tuple[str, bool]],
        rows: list[dict],
    ) -> None:
        """columns: [(name, is_numeric)]; rows: list of dicts."""
        self.tabs.append(
            {
                "id": f"tab{len(self.tabs)}",
                "name": name,
                "columns": [{"name": c, "numeric": num} for c, num in columns],
                "rows": [
                    {k: _sanitize(v) for k, v in r.items()} for r in rows
                ],
            }
        )

    def add_dataframe_tab(
        self, name: str, df: DataFrame, limit: int = 10_000
    ) -> None:
        """Collect a (small) Spark result into a tab; sorter inferred from
        the Spark dtype (numeric vs string — utils.py:488-523)."""
        cols = [
            (f.name, f.dataType.simpleString().split("(")[0] in _NUMERIC_SPARK_TYPES)
            for f in df.schema.fields
        ]
        rows = [r.asDict() for r in df.limit(limit).collect()]
        self.add_tab(name, cols, rows)

    def render(self) -> str:
        buttons = "".join(
            f'<button data-tab="{t["id"]}" onclick="showTab(\'{t["id"]}\')">'
            f'{t["name"]}</button>'
            for t in self.tabs
        )
        divs = "".join(
            f'<div id="{t["id"]}" class="tab-content"></div>' for t in self.tabs
        )
        return _TEMPLATE.format(
            title=self.title,
            tab_buttons=buttons,
            tab_divs=divs,
            tabs_json=json.dumps(self.tabs),
        )

    def save(self, path: str) -> str:
        with open(path, "w") as f:
            f.write(self.render())
        return path
