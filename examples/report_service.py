"""The reference's core use case, end to end: one declared QuerySpec
serving an interactive report — dynamic filters/orders from a JSON-ish
request, offset paging for page 1, KEYSET cursoring for the deep pages,
the {data, properties} JSON view for the web client, and a styled Excel
export whose decimal places arrive as a request parameter
(doc-01.md problems #1-#5 in one file; Sample05/09's flow).

Every request below reuses the SAME spec — the point of the declaration
layer: column renames, capability flags (orderable/filterable/likeable),
hidden sort keys, and per-column cell styles are stated once, and each
view (JSON, Excel, cursor walk) is a parameter set, not new code.

Run:  python examples/report_service.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ubw_spark import ColumnSpec, QueryParams, QuerySpec, apply_params
from ubw_spark.queries.registry import table
from ubw_spark.render import to_view
from ubw_spark.session import get_session
from ubw_spark.sources.excel import (
    CellStyle,
    read_xlsx_column_styles,
    write_excel_view,
)

PAGE = 15


def build_spec() -> QuerySpec:
    """Declared once; every request below is just parameters."""
    return QuerySpec(
        [
            # hidden raw sort/filter key (the P3 pattern): clients sort
            # and filter on "balance" but the output shows rounded money
            ColumnSpec(
                "raw_balance", expr="c_acctbal", orderable=True,
                filterable=True, visible=False,
            ),
            ColumnSpec(
                "key", expr="o_orderkey", orderable=True,
                default_desc=False, describe="order id",
            ),
            ColumnSpec("customer", expr="c_name", describe="customer"),
            ColumnSpec(
                "segment", expr="c_mktsegment", filterable=True,
                likeable=True,
            ),
            ColumnSpec(
                "total",
                expr=F.round("o_totalprice", 2).cast("double"),
                orderable=True,
                describe="order total",
                cell_style=CellStyle(decimals=2, width=14.0),
            ),
            ColumnSpec(
                "balance",
                expr=F.round("c_acctbal", 2).cast("double"),
                order_target="raw_balance",
                cell_style=CellStyle(decimals=2, width=12.0),
            ),
        ]
    )


def serve(spark, sf_dir: str, out: str) -> dict:
    """The whole request cycle against a live session; returns the
    artifacts a test can assert on."""
    os.makedirs(out, exist_ok=True)
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(customer),
        orders["o_custkey"] == customer["c_custkey"],
    )
    spec = build_spec()
    # the request "arrives" as plain data — the JSON layer's shape
    request = {
        "filters": {"segment": {"like": "%BUILD%"},
                    "raw_balance": {"gt": 0.0},
                    "not_a_column": {"eq": 1}},       # silently ignored
        "orders": [("total", True), ("key", False)],
    }

    # -- page 1: offset paging + the {data, properties} JSON view ----
    p1 = apply_params(
        base, spec,
        QueryParams(**request, page_index=1, page_size=PAGE),
    )
    view = to_view(p1, spec)
    print(f"page 1: {len(view['data'])} rows; properties: "
          + ", ".join(f"{p['property']}" for p in view["properties"]))

    # -- deep pages: keyset cursor (no growing OFFSET) ----------------
    # the cursor is the last row's effective sort-key values — exactly
    # what a service would hand the client as an opaque page token
    rows, pages = list(view["data"]), 1
    cursor = (
        {"total": rows[-1]["total"], "key": rows[-1]["key"]}
        if rows else None
    )
    while cursor is not None:
        page = apply_params(
            base, spec, QueryParams(**request, take=PAGE, after_key=cursor)
        ).collect()
        if not page:
            break
        pages += 1
        rows.extend(r.asDict() for r in page)
        cursor = {"total": page[-1]["total"], "key": page[-1]["key"]}
    full = apply_params(base, spec, QueryParams(**request)).collect()
    assert [r["key"] for r in rows] == [r["key"] for r in full], \
        "keyset walk must reproduce the full ordered result row-for-row"
    print(f"keyset walk: {pages} pages, {len(rows)} rows total — "
          f"row-for-row equal to the unpaged result "
          f"(page depth never enters the plan)")

    # -- Excel export: declared styles + runtime decimals override ----
    xlsx = os.path.join(out, "report.xlsx")
    write_excel_view(
        base, spec, xlsx,
        params=QueryParams(**request),   # same request as the JSON view
        style_params={"total": 0},       # this request wants whole dollars
    )
    styles = read_xlsx_column_styles(xlsx)
    print(f"excel: {xlsx} — total fmt {styles['total']['num_fmt']!r} "
          f"(request override), balance fmt "
          f"{styles['balance']['num_fmt']!r} (declared)")

    with open(os.path.join(out, "page1.json"), "w") as f:
        json.dump(view, f, default=str)
    print("done ->", out)
    return {
        "view": view,
        "pages": pages,
        "rows": rows,
        "styles": styles,
        "xlsx": xlsx,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/report_service")
    args = ap.parse_args()
    spark = get_session(
        "report-service", master="local[4]", shuffle_partitions=4
    )
    serve(spark, args.sf_dir, args.out)
    spark.stop()


if __name__ == "__main__":
    main()
