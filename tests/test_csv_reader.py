"""Ingest-edge tests: encodings x delimiters x cleanup (FIXTURES.md §1).

The reference's three production-debugged defects all live at this edge
(reference README.md:195-219: wrong-delimiter null fields, etc.), so each
fixture variant from FIXTURES.md gets a case.
"""

from __future__ import annotations

import pytest

from data_ingestion_worker_spark.ingest import (
    read_contacts_csv,
    sniff_csv_dialect,
)


def _write(tmp_path, name: str, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_clean_utf8_comma(spark, tmp_path):
    path = _write(tmp_path, "clean.csv",
                  b"email,first_name,last_name,company\n"
                  b"a@x.com,Ann,Ada,Acme\nb@x.com,Bob,Bee,Bmart\n")
    d = sniff_csv_dialect(spark, path)
    assert (d.encoding, d.delimiter) == ("utf-8", ",")
    rows = read_contacts_csv(spark, path).orderBy("row_number").collect()
    assert [r["email"] for r in rows] == ["a@x.com", "b@x.com"]
    assert [r["row_number"] for r in rows] == [1, 2]


def test_latin1_semicolon(spark, tmp_path):
    # 'José' in Latin-1 — invalid as UTF-8, so the fallback chain engages;
    # ';' delimiter wins per ADR-004 priority.
    path = _write(tmp_path, "latin.csv",
                  "email;first_name;last_name;company\n"
                  "jose@x.com;José;García;Niño SA\n".encode("latin-1"))
    d = sniff_csv_dialect(spark, path)
    assert d.delimiter == ";"
    assert d.encoding != "utf-8"
    rows = read_contacts_csv(spark, path).collect()
    assert rows[0]["first_name"] == "José"


def test_tab_delimited(spark, tmp_path):
    path = _write(tmp_path, "tab.csv",
                  b"email\tfirst_name\tlast_name\tcompany\n"
                  b"a@x.com\tAnn\tAda\tAcme\n")
    d = sniff_csv_dialect(spark, path)
    assert d.delimiter == "\t"
    assert read_contacts_csv(spark, path).count() == 1


def test_trailing_delimiters_drop_empty_columns(spark, tmp_path):
    path = _write(tmp_path, "trail.csv",
                  b"email;first_name;last_name;company;;\n"
                  b"a@x.com;Ann;Ada;Acme;;\n")
    df = read_contacts_csv(spark, path)
    assert set(df.columns) == {"email", "first_name", "last_name",
                               "company", "row_number"}


def test_blank_rows_dropped_and_values_trimmed(spark, tmp_path):
    path = _write(tmp_path, "blank.csv",
                  b"email,first_name,last_name,company\n"
                  b"  a@x.com  ,  Ann ,Ada,Acme\n"
                  b",,,\n"
                  b"   ,  ,,\n"
                  b"b@x.com,Bob,Bee,Bmart\n")
    rows = read_contacts_csv(spark, path).orderBy("row_number").collect()
    assert len(rows) == 2
    assert rows[0]["email"] == "a@x.com"   # trimmed
    assert rows[1]["row_number"] == 2      # numbered after drop


def test_comma_fallback_single_column(spark, tmp_path):
    # No delimiter matches -> reference falls back to ','.
    path = _write(tmp_path, "one.csv", b"email\na@x.com\n")
    d = sniff_csv_dialect(spark, path)
    assert d.delimiter == ","


def test_semicolon_not_fooled_by_comma_in_names(spark, tmp_path):
    # Header split on ';' yields names containing ',' -> ';' is rejected
    # and ',' wins (the rival-delimiter rule, s3_service.py:114-239).
    path = _write(tmp_path, "names.csv",
                  b"email,first_name,last_name,company\n"
                  b"a@x.com,Ann,Ada,Acme\n")
    d = sniff_csv_dialect(spark, path)
    assert d.delimiter == ","


def test_rfc4180_quotes(spark, tmp_path):
    """Quoted fields: embedded delimiter kept, doubled quotes unescaped —
    byte-for-byte what the reference's csv.DictReader produces."""
    path = _write(tmp_path, "quoted.csv",
                  b'email,first_name,last_name,company\n'
                  b'"a@x.com","Ann ""The Boss""","O\'Hara","Acme, Inc."\n')
    row = read_contacts_csv(spark, path).collect()[0]
    assert row["first_name"] == 'Ann "The Boss"'
    assert row["company"] == "Acme, Inc."
    assert row["last_name"] == "O'Hara"
