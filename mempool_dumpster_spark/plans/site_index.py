"""Archive file-index builder — the engine equivalent of the reference's
website generator (cmd/website/main.go:100-215, website/htmldata.go:9-26,
website/templates/index_root.html / index_files.html).

The reference lists month folders and their files from S3, then renders a
root page (one link per month) and a per-month file-listing page (filename,
human-readable size, day-banded rows). Spark-first split of the same job:

- the LISTING is data: `archive_listing` produces a DataFrame of
  (month, filename, size_bytes, modified) — from a local/posix walk here,
  or hand in any inventory table (S3 Inventory parquet at 100 TB scale;
  the reference shells out to `s3 ls` the same way, main.go:243-266);
- the PAGE MODEL is a DataFrame pipeline: per-month ordering, day
  extraction (templates' `substr10`), alternating day-band classes
  (the even/odd `$class` state machine in index_files.html:2-28) — all
  computed as window expressions, so the model scales with the archive
  while each rendered page stays tiny;
- RENDERING collects one month's rows (a few hundred files) and writes
  minimal HTML — same driver-side finish as the reference's
  template.Execute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mempool_dumpster_spark.functions.scalars import human_bytes

LISTING_SCHEMA = "month string, filename string, size_bytes long, modified string"


def archive_listing(spark: SparkSession, root: str) -> DataFrame:
    """Walk `root/<month>/<files>` into the listing DataFrame. index.html
    files are excluded exactly like the reference (main.go:267-269)."""
    import datetime

    rows = []
    for month in sorted(os.listdir(root)):
        mdir = os.path.join(root, month)
        if not os.path.isdir(mdir):
            continue
        for fn in sorted(os.listdir(mdir)):
            full = os.path.join(mdir, fn)
            if fn == "index.html" or not os.path.isfile(full):
                continue
            st = os.stat(full)
            modified = datetime.datetime.fromtimestamp(
                st.st_mtime, tz=datetime.timezone.utc
            ).strftime("%H:%M:%S %Y-%m-%d")  # htmldata.go DummyHTMLData format
            rows.append((month, fn, st.st_size, modified))
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def page_model(listing: DataFrame) -> DataFrame:
    """The per-file render model: day = first 10 chars of the filename
    (templates' substr10), band = 'even'/'odd' alternating per day GROUP
    (the template's $class flip on day change), day_change flagging the
    first file of each day (the template's $change anchor marker)."""
    w = Window.partitionBy("month").orderBy("filename")
    day = F.substring("filename", 1, 10)
    m = listing.withColumn("day", day)
    day_rank = F.dense_rank().over(Window.partitionBy("month").orderBy("day"))
    prev_day = F.lag("day").over(w)
    return (
        m.withColumn(
            "band", F.when(day_rank % 2 == 1, F.lit("even")).otherwise(F.lit("odd"))
        )
        .withColumn(
            "day_change", prev_day.isNull() | (prev_day != F.col("day"))
        )
        .orderBy("month", "filename")
    )


def _page(title: str, body: str) -> str:
    from html import escape

    return (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
        f"<title>Mempool Dumpster{(' — ' + escape(title)) if title else ''}</title>"
        "</head><body>" + body + "</body></html>"
    )


def render_root_page(months: list[str], network: str = "Ethereum Mainnet") -> str:
    """index_root.html: one link per month folder. All interpolated values
    are escaped — the reference renders through Go html/template, which
    auto-escapes (cmd/website uses website/templates via html/template)."""
    from html import escape

    items = "".join(
        f'<li><a href="ethereum/mainnet/{escape(m, quote=True)}/index.html">'
        f"{escape(m)}</a></li>"
        for m in months
    )
    return _page("", f"<h2>{escape(network)}</h2><ul>{items}</ul>")


def render_month_page(month: str, files: list, network: str = "Ethereum Mainnet") -> str:
    """index_files.html: ../ link, then one banded row per file with the
    filename link and the human-readable size. Filenames/months are escaped
    for the same html/template-parity reason as `render_root_page`."""
    from html import escape

    rows = ['<tr class="cx"><td class=fn><a href=/index.html>../</a></td><td></td></tr>']
    for r in files:
        fn = escape(r["filename"], quote=True)
        anchor = f'<a name="{escape(r["day"], quote=True)}"></a>' if r["day_change"] else ""
        rows.append(
            f'<tr class="f-{r["band"]}">'
            f'<td class=fn>{anchor}<a name="{fn}"></a>'
            f'<a href="{fn}">{fn}</a></td>'
            f'<td class=fs>{human_bytes(r["size_bytes"])}</td></tr>'
        )
    body = (
        f'<a href=/index.html>{escape(network)}</a><h2>{escape(month)}</h2>'
        f'<table><tbody>{"".join(rows)}</tbody></table>'
    )
    return _page(month, body)


def build_site(spark: SparkSession, root: str, out_dir: str) -> list[str]:
    """cmd/website's full run: root page + one page per month, written under
    `out_dir` in the reference's `ethereum/mainnet/<month>/index.html`
    layout. Returns the written paths."""
    listing = archive_listing(spark, root)
    model = page_model(listing)
    months = [r["month"] for r in listing.select("month").distinct().orderBy("month").collect()]

    written = []
    os.makedirs(out_dir, exist_ok=True)
    root_fn = os.path.join(out_dir, "index.html")
    with open(root_fn, "w") as f:
        f.write(render_root_page(months))
    written.append(root_fn)

    per_month = {m: [] for m in months}
    for r in model.collect():
        per_month[r["month"]].append(r)
    for m in months:
        mdir = os.path.join(out_dir, "ethereum", "mainnet", m)
        os.makedirs(mdir, exist_ok=True)
        fn = os.path.join(mdir, "index.html")
        with open(fn, "w") as f:
            f.write(render_month_page(m, per_month[m]))
        written.append(fn)
    return written
