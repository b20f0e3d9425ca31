"""Property-based ingest-edge tests (SURVEY.md §5 item 3).

Random field values x delimiters x encodings must round-trip through the
sniffing reader (S6-S8): values come back trimmed, row numbering follows
surviving-row order, and the dialect sniff picks the writing delimiter.
The reference's three production bugs (README.md:195-219) all live at
this edge.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_worker_spark.ingest import (
    read_contacts_csv,
    sniff_csv_dialect,
)

# Latin-1-safe, delimiter-free, no tabs (F.trim strips spaces only).
_CHARS = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 éñü")
)
_FIELD = st.text(alphabet=_CHARS, min_size=0, max_size=12)
_NONBLANK = st.text(alphabet=_CHARS, min_size=1, max_size=12).filter(
    lambda s: s.strip() != ""
)
_ROW = st.tuples(_NONBLANK, _FIELD, _FIELD, _FIELD)  # email never blank


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(_ROW, min_size=1, max_size=6),
    delimiter=st.sampled_from([",", ";", "\t"]),
    encoding=st.sampled_from(["utf-8", "latin-1", "cp1252"]),
)
def test_roundtrip(spark, tmp_path_factory, rows, delimiter, encoding):
    tmp = tmp_path_factory.mktemp("csv")
    header = delimiter.join(["email", "first_name", "last_name", "company"])
    body = "\n".join(delimiter.join(r) for r in rows)
    path = str(tmp / "data.csv")
    with open(path, "wb") as f:
        f.write((header + "\n" + body + "\n").encode(encoding))

    dialect = sniff_csv_dialect(spark, path)
    assert dialect.delimiter == delimiter

    got = read_contacts_csv(spark, path).orderBy("row_number").collect()
    assert len(got) == len(rows)
    for i, (r, exp) in enumerate(zip(got, rows), start=1):
        assert r["row_number"] == i
        assert (r["email"] or "") == exp[0].strip()
        assert (r["first_name"] or "") == exp[1].strip()
        assert (r["last_name"] or "") == exp[2].strip()
        assert (r["company"] or "") == exp[3].strip()
