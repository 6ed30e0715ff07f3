"""Avro scan/sink tests — executes the path the reference covers with its
native Avro scanner (be/src/exec/hdfs-avro-scanner.h:81: decode loops +
reader/writer schema resolution; fixtures testdata/avro_schema_resolution/).

The pure-Python codec (sources/avro_py.py) is NOT self-certified: the
round-trip tests here cross-validate BOTH directions against the Apache
Avro *Java* implementation (avro-1.12.1.jar, shipped inside pyspark/jars)
through the Spark JVM gateway."""

from __future__ import annotations

import json
import math

import pytest

from minimised_impala_spark.sources import avro_py, formats

SCHEMA_V1 = {
    "type": "record",
    "name": "thing",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "props", "type": {"type": "map", "values": "string"}},
        {"name": "legacy_only", "type": "string"},
    ],
}

# reader schema: reordered, drops legacy_only, promotes id int→long,
# adds a defaulted field — the four resolution rules the reference's
# scanner implements (hdfs-avro-scanner.cc ResolveSchemas).
SCHEMA_V2 = {
    "type": "record",
    "name": "thing",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "id", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "props", "type": {"type": "map", "values": "string"}},
        {"name": "added", "type": "double", "default": 1.5},
    ],
}

ROWS = [
    {
        "id": i,
        "name": f"n{i:03d}",
        "score": i * 0.25,
        "tag": None if i % 3 == 0 else f"t{i % 5}",
        "xs": list(range(i % 4)),
        "props": {"k": str(i)} if i % 2 else {},
        "legacy_only": "drop-me",
    }
    for i in range(50)
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    avro_py.write_container(p, SCHEMA_V1, ROWS, codec=codec)
    schema, back = avro_py.read_container(open(p, "rb").read())
    assert schema["name"] == "thing"
    assert back == ROWS


def test_schema_resolution(tmp_path):
    p = str(tmp_path / "v1.avro")
    avro_py.write_container(p, SCHEMA_V1, ROWS)
    _, back = avro_py.read_container(open(p, "rb").read(), reader_schema=SCHEMA_V2)
    assert back[7] == {
        "name": "n007",
        "id": 7,  # promoted int→long
        "score": 1.75,
        "tag": "t2",
        "xs": [0, 1, 2],
        "props": {"k": "7"},
        "added": 1.5,  # reader default
    }
    assert all("legacy_only" not in r for r in back)


def test_java_reads_python_file(spark, tmp_path):
    """Python-written container decoded by Apache Avro Java — proves the
    writer emits spec-compliant varints/blocks/sync/deflate."""
    p = str(tmp_path / "py.avro")
    avro_py.write_container(p, SCHEMA_V1, ROWS, codec="deflate")
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            (
                rec.get("id"),
                str(rec.get("name")),
                rec.get("score"),
                None if rec.get("tag") is None else str(rec.get("tag")),
            )
        )
    reader.close()
    assert got == [(r["id"], r["name"], r["score"], r["tag"]) for r in ROWS]


def test_python_reads_java_file(spark, tmp_path):
    """Java-written container decoded by the Python codec (deflate)."""
    p = str(tmp_path / "java.avro")
    jvm = spark._jvm
    schema_obj = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(
            {
                "type": "record",
                "name": "jrec",
                "fields": [
                    {"name": "k", "type": "long"},
                    {"name": "s", "type": "string"},
                    {"name": "d", "type": "double"},
                ],
            }
        )
    )
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema_obj)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema_obj, jvm.java.io.File(p))
    for i in range(40):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema_obj)
        rec.put("k", i)
        rec.put("s", f"s{i}")
        rec.put("d", i * 0.5)
        writer.append(rec)
    writer.close()
    _, rows = avro_py.read_container(open(p, "rb").read())
    assert rows == [{"k": i, "s": f"s{i}", "d": i * 0.5} for i in range(40)]


def test_spark_scan_path(spark, tmp_path):
    """read_avro over a directory of container files: binaryFile +
    mapInPandas decode, one task per file."""
    d = tmp_path / "scan"
    d.mkdir()
    half = len(ROWS) // 2
    avro_py.write_container(str(d / "a.avro"), SCHEMA_V1, ROWS[:half])
    avro_py.write_container(str(d / "b.avro"), SCHEMA_V1, ROWS[half:])
    df = formats.read_avro(spark, str(d))
    assert df.count() == len(ROWS)
    got = {r["id"]: r for r in (x.asDict(recursive=True) for x in df.collect())}
    assert got[3]["name"] == "n003" and got[3]["tag"] is None
    assert got[2]["xs"] == [0, 1] and got[1]["props"] == {"k": "1"}


def test_spark_scan_with_reader_schema(spark, tmp_path):
    d = tmp_path / "scan2"
    d.mkdir()
    avro_py.write_container(str(d / "a.avro"), SCHEMA_V1, ROWS)
    df = formats.read_avro(spark, str(d), avro_schema=json.dumps(SCHEMA_V2))
    assert dict(df.dtypes)["id"] == "bigint"  # promoted
    assert "legacy_only" not in df.columns
    row = df.filter("id = 7").collect()[0]
    assert math.isclose(row["added"], 1.5)


def test_spark_write_avro_roundtrip(spark, sf_dir, tmp_path):
    """Distributed sink (one container file per task) → scan → parity with
    the parquet original."""
    from minimised_impala_spark.tables import load_table

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    p = str(tmp_path / "sup_avro")
    formats.write_avro(sup, p)
    back = formats.read_avro(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sup.collect()))
    assert dict(back.dtypes) == dict(sup.dtypes)
