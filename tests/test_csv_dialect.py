"""Reference CSV dialect round-trips (FullETLGenerator.java:20,31-38,61-66):
`;` delimiter, header, ISO-8859-1 encoding, whitespace trim."""

from __future__ import annotations

import glob
import tempfile

from java_etl_bi_generator_spark.sources.csv_ref import (
    read_reference_csv,
    write_reference_csv,
)


def test_latin1_accents_roundtrip(spark):
    rows = [
        ("UHE.1", "Usina São João", "Hídrica"),
        ("EOL.2", "Parque Eólico Osório", "Eólica"),
        ("UTE.3", "Térmica Açu", "Fóssil"),
    ]
    df = spark.createDataFrame(rows, ["cod", "nome", "origem"])
    out = tempfile.mkdtemp(prefix="csv_dialect_") + "/t"
    write_reference_csv(df, out)
    back = read_reference_csv(spark, out, "cod string, nome string, origem string")
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
    # bytes on disk really are ISO-8859-1 (ã = 0xE3, not UTF-8 0xC3 0xA3)
    raw = b"".join(
        open(p, "rb").read()
        for p in glob.glob(out + "/part-*")
        if not p.endswith(".crc")
    )
    assert b"S\xe3o Jo\xe3o" in raw
    assert b"\xc3\xa3" not in raw


def test_semicolon_delimiter_and_trim(spark):
    src = tempfile.mkdtemp(prefix="csv_trim_") + "/in.csv"
    with open(src, "w", encoding="ISO-8859-1") as f:
        f.write("a;b\n  x  ; 1 \n")
    df = read_reference_csv(spark, src, "a string, b string")
    row = df.first()
    assert row["a"] == "x" and row["b"] == "1"  # setTrim(true) equivalent


def test_fixed_width_nulls_malformed_and_overflow(spark, tmp_path):
    """Fixed-width edge behavior: null ints render as spaces and read
    back null; malformed numerics try_cast to null instead of failing
    ANSI; an overlong value raises at WRITE time (silent truncation
    would corrupt every later column's offsets)."""
    import pytest

    from java_etl_bi_generator_spark.sources.fixed_width import (
        read_fixed_width,
        write_fixed_width,
    )

    specs = [("k", 4, "int"), ("name", 8, "string"), ("v", 6, "double")]
    df = spark.createDataFrame(
        [(1, "ok", 2.5), (None, "noint", None)],
        "k int, name string, v double",
    )
    p = str(tmp_path / "fw")
    write_fixed_width(df, p, specs)
    back = {r["name"]: r for r in read_fixed_width(spark, p, specs).collect()}
    assert (back["ok"]["k"], back["ok"]["v"]) == (1, 2.5)
    assert back["noint"]["k"] is None and back["noint"]["v"] is None

    # malformed numeric text -> null, not an ANSI error
    raw = spark.createDataFrame([("abcdok      12x34 ",)], "value string")
    raw.write.mode("overwrite").text(str(tmp_path / "fw2"))
    got = read_fixed_width(spark, str(tmp_path / "fw2"), specs).collect()[0]
    assert got["k"] is None and got["name"] == "ok" and got["v"] is None

    # overflow raises on write
    wide = spark.createDataFrame(
        [(12345, "x", 0.0)], "k int, name string, v double"
    )
    with pytest.raises(Exception, match="fixed-width overflow"):
        write_fixed_width(wide, str(tmp_path / "fw3"), specs)

    # embedded newline raises on write (it would split the physical row)
    nl = spark.createDataFrame(
        [(1, "a\nb", 0.0)], "k int, name string, v double"
    )
    with pytest.raises(Exception, match="line terminator|overflow"):
        write_fixed_width(nl, str(tmp_path / "fw4"), specs)

    # NULL and '' conflate to NULL on read (declared format limit)
    ns = spark.createDataFrame(
        [(7, None, 1.0), (8, "", 2.0)], "k int, name string, v double"
    )
    write_fixed_width(ns, str(tmp_path / "fw5"), specs)
    got5 = {
        r["k"]: r["name"]
        for r in read_fixed_width(spark, str(tmp_path / "fw5"), specs).collect()
    }
    assert got5 == {7: None, 8: None}


def test_reference_csv_golden_bytes(spark):
    """Round-5 verdict task 7 — byte-exact write path: a single part
    file must carry the EXACT reference byte stream, `;`-joined header
    line first, accents as single ISO-8859-1 bytes, one \\r\\n (CRLF —
    Commons-CSV CSVFormat.DEFAULT's recordSeparator) terminator per
    record including the last (FullETLGenerator.java:36-38, 63-66,
    145-150).  Lifts SURVEY §7.4's byte-exactness non-goal for the
    write side."""
    rows = [
        ("UHE.1", "Usina São João", "Hídrica"),
        ("EOL.2", "Parque Eólico Osório", "Eólica"),
    ]
    df = spark.createDataFrame(rows, ["cod", "nome", "origem"]).coalesce(1)
    out = tempfile.mkdtemp(prefix="csv_golden_") + "/t"
    write_reference_csv(df, out)
    parts = [
        p for p in glob.glob(out + "/part-*") if not p.endswith(".crc")
    ]
    assert len(parts) == 1
    raw = open(parts[0], "rb").read()
    expected = (
        "cod;nome;origem\r\n"
        "UHE.1;Usina São João;Hídrica\r\n"
        "EOL.2;Parque Eólico Osório;Eólica\r\n"
    ).encode("ISO-8859-1")
    assert raw == expected
