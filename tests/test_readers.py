"""Reader tests: F1 validity filters + reject accounting, blacklist reader,
trash 4-field rows, zip expansion (S1/S2/S4/S5/S6)."""

from __future__ import annotations

import os
import zipfile

from mempool_dumpster_spark.sources.readers import (
    read_blacklist_csv,
    read_sourcelog_csv,
    read_trash_csv,
    read_tx_csv,
)
from mempool_dumpster_spark.sources.zipcsv import expand_zip_inputs

H1 = "0x" + "ab" * 32
H2 = "0x" + "cd" * 32


def test_tx_csv_validity(spark, tmp_path):
    p = tmp_path / "txs.csv"
    p.write_text(
        f"1693785600337,{H1},0xdead\n"
        f"1693785600338,{H1.upper()},0xbeef\n"  # uppercase hash → lowercased
        f"notanumber,{H2},0xdead\n"  # bad timestamp → reject
        f"1693785600339,0x1234,0xdead\n"  # short hash → reject
        f"just,one,field,too,many\n"  # malformed → reject
        f"1693785600340,{H2},\n"  # missing raw_tx → reject
    )
    res = read_tx_csv(spark, str(p))
    rows = res.valid.collect()
    assert len(rows) == 2
    assert all(r["hash"] == H1 for r in rows)
    assert res.reject_count() == 4


def test_sourcelog_csv_validity(spark, tmp_path):
    p = tmp_path / "sl.csv"
    p.write_text(
        f"100,{H1},alchemy\n"
        f"90,{H1},alchemy\n"  # duplicate, smaller ts — kept (dedup is downstream)
        f"95,{H1},infura\n"
        f"bad,{H2},x\n"
        f"100,0xdead,x\n"
    )
    res = read_sourcelog_csv(spark, str(p))
    assert res.valid.count() == 3
    assert res.reject_count() == 2


def test_trash_csv_four_field_rows(spark, tmp_path):
    p = tmp_path / "trash.csv"
    p.write_text(
        f"100,{H1},alchemy,signature-error,note\n"
        f"101,{H2},infura,chainId not set\n"  # 4-field row is legal
    )
    res = read_trash_csv(spark, str(p))
    rows = {r["hash"]: r for r in res.valid.collect()}
    assert rows[H2]["notes"] == ""
    assert rows[H1]["notes"] == "note"
    assert res.reject_count() == 0


def test_blacklist_second_column(spark, tmp_path):
    p = tmp_path / "bl.csv"
    p.write_text(
        f"123,{H1},whatever,else\n"
        f"456,short\n"  # short hash skipped
        f"789,{H1}\n"  # duplicate collapses
    )
    bl = read_blacklist_csv(spark, str(p))
    assert [r["hash"] for r in bl.collect()] == [H1]


def test_zip_expansion(spark, tmp_path):
    csv_inner = f"100,{H1},0xdead\n"
    zpath = tmp_path / "day.csv.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("part1.csv", csv_inner)
        zf.writestr("ignore.txt", "not a csv")
    plain = tmp_path / "plain.csv"
    plain.write_text(f"200,{H2},0xbeef\n")
    paths = expand_zip_inputs([str(zpath), str(plain)], scratch_dir=str(tmp_path / "x"))
    os.makedirs(tmp_path / "x", exist_ok=True)
    res = read_tx_csv(spark, paths)
    got = {r["hash"] for r in res.valid.collect()}
    assert got == {H1, H2}


def test_zip_expansion_same_basename_no_collision(spark, tmp_path):
    """The reference layout puts an identically-named archive in every
    dated directory — extraction targets must not collide (a collision
    silently replaced day 1's rows with two copies of day 2's)."""
    for day, payload in (("d1", f"100,{H1},0xdead\n"), ("d2", f"200,{H2},0xbeef\n")):
        os.makedirs(tmp_path / day, exist_ok=True)
        with zipfile.ZipFile(tmp_path / day / "transactions.csv.zip", "w") as zf:
            zf.writestr("transactions.csv", payload)
    paths = expand_zip_inputs(
        [
            str(tmp_path / "d1" / "transactions.csv.zip"),
            str(tmp_path / "d2" / "transactions.csv.zip"),
        ],
        scratch_dir=str(tmp_path / "scratch"),
    )
    assert len(paths) == len(set(paths)) == 2
    got = {r["hash"] for r in read_tx_csv(spark, paths).valid.collect()}
    assert got == {H1, H2}


def test_zip_distributed_reader_quoted_commas(spark, tmp_path):
    """Executor-side unzip must parse RFC-4180: a quoted field containing
    a comma is one column, with the quotes stripped — not a column shift."""
    from mempool_dumpster_spark.sources.zipcsv import read_zip_members_distributed

    zpath = tmp_path / "trash.csv.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("t.csv", f'123,{H1},src,"re,ason",note\n')
    out = read_zip_members_distributed(spark, str(zpath), n_columns=5).collect()
    assert len(out) == 1
    assert out[0]["c3"] == "re,ason" and out[0]["c4"] == "note"


def test_read_documents_jsonl(spark, tmp_path):
    """JSONL corpus source: well-formed rows parse with meta; broken JSON
    and missing-field lines land in rejects with a countable total."""
    import json

    from mempool_dumpster_spark.sources.readers import read_documents_jsonl

    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"doc_id": "d1", "text": "hello world", "meta": {"lang": "en"}}),
        json.dumps({"doc_id": "d2", "text": "zwei", "meta": None}),
        '{"doc_id": "broken json...',            # corrupt line
        json.dumps({"doc_id": "d3"}),            # missing text
        json.dumps({"text": "no id here"}),      # missing id
    ]
    p.write_text("\n".join(lines) + "\n")
    res = read_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r for r in res.valid.collect()}
    assert set(rows) == {"d1", "d2"}
    assert rows["d1"]["meta"]["lang"] == "en"
    assert res.reject_count() == 3
